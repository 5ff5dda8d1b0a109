"""Unit tests for the invertible-op library: round-trips and logdet vs autodiff."""

import pytest as _pytest

pytestmark = _pytest.mark.smoke

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcflow_tpu.ops import actnorm, coupling, densities, invconv, quant
from hcflow_tpu.ops.squeeze import (
    haar_squeeze2d,
    haar_unsqueeze2d,
    nearest_upsample,
    squeeze2d,
    unsqueeze2d,
)

KEY = jax.random.PRNGKey(0)


def rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def numeric_logdet(fn, x):
    """log|det J| of a bijection on a flattened single-sample input."""
    flat = x.reshape(-1)

    def f(v):
        return fn(v.reshape(x.shape)).reshape(-1)

    J = jax.jacfwd(f)(flat)
    return jnp.linalg.slogdet(J)[1]


# --------------------------------------------------------------------- squeeze
def test_squeeze_roundtrip():
    x = rand(KEY, (2, 8, 8, 3))
    y = squeeze2d(x)
    assert y.shape == (2, 4, 4, 12)
    np.testing.assert_allclose(unsqueeze2d(y), x, rtol=0, atol=0)


def test_squeeze_channel_order_matches_reference():
    # torch: view(B,C,H/f,f,W/f,f).permute(0,1,3,5,2,4) => channel = c*4 + fh*2 + fw
    x = np.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(np.float32)
    y = np.asarray(squeeze2d(jnp.asarray(x)))
    for c in range(3):
        for fh in range(2):
            for fw in range(2):
                np.testing.assert_array_equal(
                    y[:, :, :, c * 4 + fh * 2 + fw], x[:, fh::2, fw::2, c]
                )


def test_haar_roundtrip_and_orthogonality():
    x = rand(KEY, (2, 8, 8, 3))
    y = haar_squeeze2d(x)
    assert y.shape == (2, 4, 4, 12)
    np.testing.assert_allclose(haar_unsqueeze2d(y), x, rtol=1e-6, atol=1e-6)
    # filter-major channel order: first C channels are the LL (average) band
    ll = y[..., :3]
    avg = (x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]) / 4
    np.testing.assert_allclose(ll, avg, rtol=1e-6, atol=1e-6)


def test_nearest_upsample():
    x = rand(KEY, (1, 2, 2, 3))
    y = nearest_upsample(x, 2)
    assert y.shape == (1, 4, 4, 3)
    np.testing.assert_array_equal(y[:, ::2, ::2], x)
    np.testing.assert_array_equal(y[:, 1::2, 1::2], x)


# --------------------------------------------------------------------- actnorm
def test_actnorm_roundtrip_and_logdet():
    C = 6
    p = actnorm.init(C)
    p = {"bias": rand(KEY, (C,)) * 0.3, "logs": rand(jax.random.PRNGKey(1), (C,)) * 0.2}
    x = rand(jax.random.PRNGKey(2), (2, 4, 4, C))
    ld0 = jnp.zeros((2,))
    y, ld = actnorm.forward(p, x, ld0)
    x2, ld2 = actnorm.inverse(p, y, ld)
    np.testing.assert_allclose(x2, x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ld2, 0.0, atol=1e-5)
    # logdet vs autodiff jacobian
    want = numeric_logdet(lambda v: actnorm.forward(p, v[None])[0][0], x[0])
    np.testing.assert_allclose(ld[0], want, rtol=1e-3)


def test_actnorm_calibration_normalizes():
    C = 4
    x = rand(KEY, (8, 6, 6, C)) * 3.0 + 1.5
    p = actnorm.calibrate(x)
    y, _ = actnorm.forward(p, x)
    np.testing.assert_allclose(jnp.mean(y, axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(jnp.var(y, axis=(0, 1, 2)), 1.0, rtol=1e-3)


# --------------------------------------------------------------------- invconv
@pytest.mark.parametrize("lu", [False, True])
def test_invconv_roundtrip_and_logdet(lu):
    C = 8
    p = (invconv.init_lu if lu else invconv.init)(KEY, C)
    x = rand(jax.random.PRNGKey(3), (2, 4, 4, C))
    ld0 = jnp.zeros((2,))
    y, ld = invconv.forward(p, x, ld0)
    x2, ld2 = invconv.inverse(p, y, ld)
    np.testing.assert_allclose(x2, x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ld2, 0.0, atol=1e-4)
    want = numeric_logdet(lambda v: invconv.forward(p, v[None])[0][0], x[0])
    np.testing.assert_allclose(ld[0], want, rtol=1e-3, atol=1e-3)


def test_invconv_lu_weight_matches_plain_apply():
    C = 6
    p = invconv.init_lu(KEY, C)
    l, u = invconv._lu_weight(p)
    w = p["p"] @ l @ u
    x = rand(jax.random.PRNGKey(4), (1, 2, 2, C))
    y_lu, _ = invconv.forward(p, x)
    y_w, _ = invconv.forward({"weight": w}, x)
    np.testing.assert_allclose(y_lu, y_w, rtol=1e-5, atol=1e-6)


# -------------------------------------------------------------------- coupling
@pytest.mark.parametrize("kind,cond", [("Affine", None), ("Affine", 8), ("AffineInjector", 8)])
def test_coupling_roundtrip_and_logdet(kind, cond):
    C = 6
    spec = coupling.CouplingSpec(kind=kind, in_channels=C, cond_channels=cond, hidden_channels=16)
    p = spec.init(KEY)
    # randomize the zero-init last conv so the transform is non-trivial
    p = jax.tree.map(lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(7), a.shape), p)
    x = rand(jax.random.PRNGKey(5), (2, 4, 4, C))
    u = rand(jax.random.PRNGKey(6), (2, 4, 4, cond)) if cond else None
    ld0 = jnp.zeros((2,))
    y, ld = spec.forward(p, x, u, ld0)
    x2, _ = spec.inverse(p, y, u)
    np.testing.assert_allclose(x2, x, rtol=1e-4, atol=1e-5)
    want = numeric_logdet(
        lambda v: spec.forward(p, v[None], None if u is None else u[:1])[0][0], x[0]
    )
    np.testing.assert_allclose(ld[0], want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("lrvso", [True, False])
def test_coupling_3shift_roundtrip(lrvso):
    C = 12
    spec = coupling.CouplingSpec(
        kind="Affine3shift",
        in_channels=C,
        nn_module="DenseBlock",
        hidden_channels=8,
        lr_vs_others=lrvso,
    )
    p = spec.init(KEY)
    p = jax.tree.map(lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(8), a.shape), p)
    x = rand(jax.random.PRNGKey(9), (2, 4, 4, C))
    ld0 = jnp.zeros((2,))
    y, ld = spec.forward(p, x, None, ld0)
    x2, _ = spec.inverse(p, y, None)
    np.testing.assert_allclose(x2, x, rtol=1e-4, atol=1e-5)
    if not lrvso:  # shift-only: volume preserving
        np.testing.assert_allclose(ld, 0.0, atol=1e-6)


def test_coupling_identity_at_init():
    """Zero-init last conv => coupling starts as the identity with zero logdet."""
    spec = coupling.CouplingSpec(kind="Affine", in_channels=6, hidden_channels=16)
    p = spec.init(KEY)
    x = rand(jax.random.PRNGKey(5), (2, 4, 4, 6))
    y, ld = spec.forward(p, x, None, jnp.zeros((2,)))
    np.testing.assert_allclose(y, x, atol=1e-6)
    np.testing.assert_allclose(ld, 0.0, atol=1e-6)


# ------------------------------------------------------------------- densities
def test_gaussian_logp_matches_closed_form():
    x = rand(KEY, (2, 3, 3, 2))
    mean = jnp.zeros_like(x)
    logs = jnp.zeros_like(x)
    lp = densities.gaussian_logp(mean, logs, x)
    want = jnp.sum(-0.5 * (x**2 + np.log(2 * np.pi)), axis=(1, 2, 3))
    np.testing.assert_allclose(lp, want, rtol=1e-6)
    # unconditional form
    lp2 = densities.gaussian_logp(None, None, x)
    np.testing.assert_allclose(lp2, want, rtol=1e-6)


def test_gaussian_sample_zero_temperature_is_mean():
    mean = rand(KEY, (2, 3, 3, 2))
    logs = rand(jax.random.PRNGKey(1), (2, 3, 3, 2))
    s = densities.gaussian_sample(jax.random.PRNGKey(2), mean, logs, 0.0)
    np.testing.assert_allclose(s, mean, atol=1e-7)


# ----------------------------------------------------------------------- quant
def test_quantize_ste_values_and_gradient():
    x = jnp.array([-0.2, 0.0, 0.5004, 1.3])
    y = quant.quantize_ste(x)
    np.testing.assert_allclose(y, [0.0, 0.0, jnp.round(0.5004 * 255) / 255, 1.0], atol=1e-7)
    g = jax.grad(lambda v: jnp.sum(quant.quantize_ste(v) * 2.0))(x)
    np.testing.assert_allclose(g, 2.0 * jnp.ones_like(x))
