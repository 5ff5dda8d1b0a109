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
