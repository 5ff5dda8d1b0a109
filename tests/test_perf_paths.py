"""Correctness of the performance paths: bf16 compute mode + precomputed inverses."""

import jax
import jax.numpy as jnp
import numpy as np

from hcflow_tpu.flow.flownet import FlowNetSpec
from hcflow_tpu.models.hcflow_sr import HCFlowSRSpec

TINY = dict(
    K=(3, 3), after_splitoff=(1, 1), rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
    hidden_channels=8, so_hidden_channels=8,
)


def test_precompute_inference_matches():
    """Reverse/forward with precomputed invconv inverses must match the plain path."""
    model = HCFlowSRSpec.for_scale(4, **TINY)
    p = model.init(jax.random.PRNGKey(0))
    p = jax.tree.map(lambda a: a + 0.02 * jax.random.normal(jax.random.PRNGKey(9), a.shape), p)
    pp = model.flow.precompute_inference(p)
    lr = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    hr = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    key = jax.random.PRNGKey(3)

    a = model.reverse(p, key, lr, 0.5)
    b = model.reverse(pp, key, lr, 0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    _, nll_a = model.forward(p, key, hr, lr)
    _, nll_b = model.forward(pp, key, hr, lr)
    np.testing.assert_allclose(float(nll_a), float(nll_b), rtol=1e-6)


def test_bf16_mode_invertibility_exact():
    """bf16 coupling nets must not break forward/inverse round-trips (the NN is the
    same deterministic function in both directions; only its output precision drops)."""
    spec = FlowNetSpec(L=2, compute_dtype="bfloat16", **TINY)
    p = spec.init(jax.random.PRNGKey(0))
    p = jax.tree.map(lambda a: a + 0.02 * jax.random.normal(jax.random.PRNGKey(9), a.shape), p)
    from hcflow_tpu.flow import stack

    lv = spec.levels[0]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 12))
    ld = jnp.zeros((2,))
    y, ldf = stack.forward_stack(lv.main_spec, p["level0"]["main"], x, None, ld)
    x2, ld2 = stack.inverse_stack(lv.main_spec, p["level0"]["main"], y, None, ldf)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-3)


def test_bf16_mode_close_to_f32():
    """bf16 reverse should stay close to the f32 reverse (same params, same key)."""
    m32 = HCFlowSRSpec.for_scale(4, **TINY)
    m16 = HCFlowSRSpec.for_scale(4, compute_dtype="bfloat16", **TINY)
    p = m32.init(jax.random.PRNGKey(0))
    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
    key = jax.random.PRNGKey(2)
    a = np.asarray(m32.reverse(p, key, lr, 0.0))
    b = np.asarray(m16.reverse(p, key, lr, 0.0))
    # loose: bf16 has ~3 decimal digits; the flows amplify somewhat
    assert np.mean(np.abs(a - b)) < 2e-2, np.mean(np.abs(a - b))


def test_scatter_rdb_matches_canonical():
    from hcflow_tpu.ops import nets

    p = nets.init_rdb(jax.random.PRNGKey(0), nf=64, gc=32)
    p = jax.tree.map(lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1), a.shape), p)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 64))
    a = nets.apply_rdb(p, x)
    b = nets.apply_rdb_scatter(p, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_pallas_conv3x3_interpret_matches_xla():
    """Pallas conv kernel (interpret mode on CPU) must equal the XLA conv."""
    from hcflow_tpu.ops import nets
    from hcflow_tpu.ops.pallas_conv import conv3x3_pallas

    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1
    want = nets.conv2d(x, w, b)
    got = conv3x3_pallas(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
