"""ActNorm: per-channel affine normalization with data-dependent initialization.

Behavioral reference: /root/reference/codes/models/modules/ActNorms.py:7-107.
Forward: ``y = (x + bias) * exp(logs)``; logdet contribution ``sum(logs) * H * W``.
Inverse: ``x = y * exp(-logs) - bias``.

The reference initializes bias/logs from the first minibatch as a hidden side effect of
the first forward pass.  Here that is an explicit, pure calibration step
(:func:`calibrate`) returning freshly initialized parameters — run it once on a real
batch before jit-compiled training (mirrors ``act_norm_start_step`` semantics of
HCFlow_SR_model.py:186-187).
"""

from __future__ import annotations

import jax.numpy as jnp


def init(num_channels: int, dtype=jnp.float32) -> dict:
    return {
        "bias": jnp.zeros((num_channels,), dtype),
        "logs": jnp.zeros((num_channels,), dtype),
    }


def forward(params: dict, x: jnp.ndarray, logdet=None):
    """(x + bias) * exp(logs) on NHWC; accumulates logdet if given."""
    y = (x + params["bias"]) * jnp.exp(params["logs"])
    if logdet is not None:
        H, W = x.shape[1], x.shape[2]
        logdet = logdet + jnp.sum(params["logs"]) * (H * W)
    return y, logdet


def inverse(params: dict, y: jnp.ndarray, logdet=None):
    x = y * jnp.exp(-params["logs"]) - params["bias"]
    if logdet is not None:
        H, W = y.shape[1], y.shape[2]
        logdet = logdet - jnp.sum(params["logs"]) * (H * W)
    return x, logdet


def calibrate(x: jnp.ndarray, scale: float = 1.0) -> dict:
    """Data-dependent init: output of forward() has zero mean / unit variance on x."""
    bias = -jnp.mean(x, axis=(0, 1, 2))
    var = jnp.mean((x + bias) ** 2, axis=(0, 1, 2))
    logs = jnp.log(scale / (jnp.sqrt(var) + 1e-6))
    return {"bias": bias.astype(x.dtype), "logs": logs.astype(x.dtype)}
