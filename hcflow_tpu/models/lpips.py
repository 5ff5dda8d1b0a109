"""LPIPS perceptual metric (AlexNet backbone) in JAX.

Behavioral reference: the reference evaluates LPIPS via the ``lpips`` pip package with
the AlexNet backbone (test_HCFlow.py:48,132), on inputs scaled to [-1, 1].

Algorithm (Zhang et al. 2018): run both images through AlexNet conv features (5
stages), unit-normalize each feature map over channels, take the squared difference,
apply the learned per-channel linear weights (1x1 conv), average spatially, sum over
stages.

Pretrained weights cannot be downloaded here (zero egress); use
``convert_lpips_torch`` on an ``lpips.LPIPS(net='alex')`` state_dict elsewhere and
ship the .npz.  ``load`` returns None when weights are absent — callers skip LPIPS.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, padding), with maxpool after 0,1
_ALEX = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = {0, 1}
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + b


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _features(params, x):
    feats = []
    h = x
    for i, (_, k, s, p) in enumerate(_ALEX):
        h = _conv(h, params[f"conv{i}"]["w"], params[f"conv{i}"]["b"], s, p)
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return feats


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips_distance(params: dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per batch element. img0/img1: NHWC RGB in [-1, 1]."""
    x0 = (img0 - _SIFT_SHIFT()) / _SIFT_SCALE()
    x1 = (img1 - _SIFT_SHIFT()) / _SIFT_SCALE()
    f0s, f1s = _features(params, x0), _features(params, x1)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(f0s, f1s)):
        d = (_unit_normalize(f0) - _unit_normalize(f1)) ** 2
        w = params[f"lin{i}"]["w"]  # (C,) nonneg linear weights
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def _SIFT_SHIFT():
    return jnp.asarray(_SHIFT)


def _SIFT_SCALE():
    return jnp.asarray(_SCALE)


def convert_lpips_torch(sd) -> dict:
    """Convert an ``lpips.LPIPS(net='alex')`` state_dict (numpy-ified) to a pytree.

    Expected keys: net.slice{1..5}.<idx>.weight/bias (AlexNet convs) and
    lin{0..4}.model.1.weight (linear heads).
    """
    params = {}
    # alexnet conv layer indices within torchvision features: 0, 3, 6, 8, 10
    slice_conv = {  # (slice, idx-in-slice) per conv stage
        0: ("slice1", 0), 1: ("slice2", 3), 2: ("slice3", 6),
        3: ("slice4", 8), 4: ("slice5", 10),
    }
    for i, (sl, idx) in slice_conv.items():
        w = None
        for key_fmt in (f"net.{sl}.{idx}.weight", f"net.features.{idx}.weight"):
            if key_fmt in sd:
                w = np.asarray(sd[key_fmt])
                b = np.asarray(sd[key_fmt.replace("weight", "bias")])
                break
        assert w is not None, f"missing alexnet conv {i}"
        params[f"conv{i}"] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "b": jnp.asarray(b),
        }
    for i in range(5):
        for key_fmt in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key_fmt in sd:
                params[f"lin{i}"] = {"w": jnp.asarray(np.asarray(sd[key_fmt]).reshape(-1))}
                break
        assert f"lin{i}" in params, f"missing lpips lin{i}"
    return params


def random_params(seed: int = 0) -> dict:
    """Deterministic He-init random AlexNet LPIPS — the documented substitute when
    the learned weights are unavailable (zero-egress environment).

    Random-feature perceptual distances correlate with human judgments well above
    pixel metrics (Zhang et al. 2018, CVPR — Table 5 reports untrained nets beating
    L2/SSIM; see also He et al., NeurIPS 2016 on random-weight deep features).  The
    learned per-channel lin weights are replaced by a uniform 1/C average.  Callers
    must label the metric distinctly (``lpips_rand``) — values are NOT comparable to
    true LPIPS numbers.
    """
    key = jax.random.PRNGKey(seed)
    params = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(_ALEX):
        key, sub = jax.random.split(key)
        std = float(np.sqrt(2.0 / (k * k * cin)))
        params[f"conv{i}"] = {
            "w": jax.random.normal(sub, (k, k, cin, cout)) * std,
            "b": jnp.zeros((cout,)),
        }
        params[f"lin{i}"] = {"w": jnp.full((cout,), 1.0 / cout)}
        cin = cout
    return params


def save_npz(path: str, params: dict) -> None:
    flat = {f"{k}/{lk}": np.asarray(v) for k, sub in params.items() for lk, v in sub.items()}
    np.savez(path, **flat)


def load(path: str) -> Optional[dict]:
    """Load converted LPIPS weights; None if the file is absent."""
    try:
        data = np.load(path)
    except (FileNotFoundError, OSError):
        return None
    params: dict = {}
    for k in data.files:
        name, leaf = k.rsplit("/", 1)
        params.setdefault(name, {})[leaf] = jnp.asarray(data[k])
    return params


def make_metric(params: dict):
    """Returns lpips(img0_hwc01, img1_hwc01) -> float on [0,1] numpy images."""
    fn = jax.jit(lpips_distance)

    def metric(a, b):
        a = jnp.asarray(a)[None] * 2.0 - 1.0
        b = jnp.asarray(b)[None] * 2.0 - 1.0
        return float(fn(params, a, b)[0])

    return metric
