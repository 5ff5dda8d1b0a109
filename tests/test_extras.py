"""Tests for inventory-parity extras: permutations, sigmoid flow, splits, RDN, tiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.flow.flowstep import FlowStepSpec
from hcflow_tpu.ops import extras, permute

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("shuffle", [False, True])
def test_permute2d_roundtrip(shuffle):
    p = permute.init(8, shuffle=shuffle, seed=3)
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    y, _ = permute.forward(p, x)
    x2, _ = permute.inverse(p, y)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
    if not shuffle:  # reversal
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x[..., ::-1]))


def test_flowstep_with_reverse_permutation():
    spec = FlowStepSpec(in_channels=8, flow_permutation="reverse", hidden_channels=8)
    p = spec.init(KEY)
    p = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
        if a.dtype == jnp.float32 else a, p,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 8))
    y, ld = spec.forward(p, x, None, jnp.zeros((2,)))
    x2, _ = spec.inverse(p, y, None)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_sigmoid_flow_roundtrip_and_logdet():
    x = jax.random.normal(KEY, (2, 4, 4, 3))
    ld0 = jnp.zeros((2,))
    y, ld = extras.sigmoid_forward(x, ld0)
    x2, ld2 = extras.sigmoid_inverse(y, ld)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
    # numeric logdet check on one sample
    flat = x[0].reshape(-1)
    J = jax.jacfwd(lambda v: extras.sigmoid_forward(v.reshape(1, 4, 4, 3))[0].reshape(-1))(flat)
    want = jnp.linalg.slogdet(J)[1]
    np.testing.assert_allclose(float(ld[0]), float(want), rtol=1e-4)


def test_masked_actnorm():
    from hcflow_tpu.ops import actnorm

    p = {"bias": jax.random.normal(KEY, (4,)) * 0.3,
         "logs": jax.random.normal(jax.random.PRNGKey(1), (4,)) * 0.2}
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 4, 4))
    mask = jnp.array([True, False, True])
    y, ld = extras.masked_actnorm_forward(p, x, mask, jnp.zeros((3,)))
    np.testing.assert_array_equal(np.asarray(y[1]), np.asarray(x[1]))
    assert float(ld[1]) == 0.0 and float(ld[0]) != 0.0
    x2, ld2 = extras.masked_actnorm_inverse(p, y, mask, ld)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-4)


def test_split2d_learned_prior_roundtrip():
    spec = extras.Split2dSpec(num_channels=8, num_channels_pass=4)
    p = spec.init()
    p = jax.tree.map(lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1), a.shape), p)
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    z1, ld, eps = spec.forward(p, x, jnp.zeros((2,)))
    assert z1.shape == (2, 4, 4, 4) and eps.shape == (2, 4, 4, 4)
    # inverse with the recorded eps reconstructs x and cancels logdet
    x2, ld2 = spec.inverse(p, jax.random.PRNGKey(3), z1, ld, eps=eps)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-3)


def test_rdn_identity_at_init_for_flow():
    spec = extras.RDNSpec(in_channels=4, out_channels=6, nb=1, nf=8, gc=4)
    p = spec.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    y = spec.apply(p, x)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)  # zero-init last conv


def test_tiled_reverse_matches_whole_image_structure():
    """Tiled inference produces the right shape and matches full inference away from
    tile seams for a translation-equivariant (conv) model."""
    from hcflow_tpu.cli.tiled import tiled_reverse
    from hcflow_tpu.models import HCFlowSRSpec

    model = HCFlowSRSpec.for_scale(
        4, K=(2, 2), after_splitoff=(1, 1), rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
        hidden_channels=8, so_hidden_channels=8,
    )
    params = model.init(KEY)
    rev = jax.jit(lambda p, k, x, e: model.reverse(p, k, x, e))
    lr = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (40, 40, 3)))
    out = tiled_reverse(rev, params, jax.random.PRNGKey(2), lr, 4, 0.0, tile=24, overlap=4)
    assert out.shape == (160, 160, 3)
    whole = np.asarray(rev(params, jax.random.PRNGKey(2), lr[None], 0.0)[0])
    # centers of tiles should match the whole-image result closely (eps_std=0)
    diff = np.abs(out - whole)
    assert np.median(diff) < 5e-2
