"""Structural LPIPS tests (real weights unavailable offline; random init here)."""

import jax
import jax.numpy as jnp
import numpy as np

from hcflow_tpu.models import lpips


def _random_params(key):
    params = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(lpips._ALEX):
        key, k1 = jax.random.split(key)
        params[f"conv{i}"] = {
            "w": jax.random.normal(k1, (k, k, cin, cout)) * 0.02,
            "b": jnp.zeros((cout,)),
        }
        cin = cout
    for i, (cout, *_rest) in enumerate(lpips._ALEX):
        params[f"lin{i}"] = {"w": jnp.abs(jax.random.normal(jax.random.PRNGKey(i), (cout,)))}
    return params


def test_lpips_identity_is_zero_and_symmetric():
    params = _random_params(jax.random.PRNGKey(0))
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 2 - 1
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 2 - 1
    d_aa = lpips.lpips_distance(params, a, a)
    np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-6)
    d_ab = lpips.lpips_distance(params, a, b)
    d_ba = lpips.lpips_distance(params, b, a)
    np.testing.assert_allclose(np.asarray(d_ab), np.asarray(d_ba), rtol=1e-5)
    assert float(d_ab[0]) > 0


def test_lpips_save_load_roundtrip(tmp_path):
    params = _random_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "lpips.npz")
    lpips.save_npz(path, params)
    loaded = lpips.load(path)
    for k in params:
        for lk in params[k]:
            np.testing.assert_array_equal(np.asarray(params[k][lk]), np.asarray(loaded[k][lk]))
    assert lpips.load(str(tmp_path / "missing.npz")) is None


def test_lpips_metric_wrapper():
    params = _random_params(jax.random.PRNGKey(0))
    metric = lpips.make_metric(params)
    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    assert metric(img, img) < 1e-6
    assert metric(img, 1 - img) > 0


def test_random_fallbacks_are_usable_perceptual_signals():
    """The documented zero-egress substitutes: He-init random AlexNet LPIPS and
    random VGG features must be deterministic and rank distortions sensibly
    (identity < mild noise < heavy noise)."""
    from hcflow_tpu.models.vgg import VGG19FeatureSpec, random_features

    rp = lpips.random_params(seed=0)
    rp2 = lpips.random_params(seed=0)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        rp, rp2,
    )
    metric = lpips.make_metric(rp)
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    mild = np.clip(img + 0.05 * rng.standard_normal(img.shape), 0, 1).astype(np.float32)
    heavy = np.clip(img + 0.4 * rng.standard_normal(img.shape), 0, 1).astype(np.float32)
    d0, d1, d2 = metric(img, img), metric(img, mild), metric(img, heavy)
    assert d0 < 1e-6 and d0 < d1 < d2, (d0, d1, d2)

    vp = random_features(seed=0)
    spec = VGG19FeatureSpec()
    f = jax.jit(spec.apply)
    fa = f(vp, jnp.asarray(img)[None])
    assert bool(jnp.all(jnp.isfinite(fa)))
    # He init keeps feature magnitudes in a healthy range through 16 layers
    scale = float(jnp.abs(fa).mean())
    assert 1e-3 < scale < 1e3, scale
    e1 = float(jnp.abs(fa - f(vp, jnp.asarray(mild)[None])).mean())
    e2 = float(jnp.abs(fa - f(vp, jnp.asarray(heavy)[None])).mean())
    assert 0 < e1 < e2, (e1, e2)
