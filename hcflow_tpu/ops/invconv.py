"""Invertible 1x1 convolution (learned channel mixing), plain and LU-decomposed.

Behavioral reference: /root/reference/codes/models/modules/Permutations.py:33-108.
On NHWC a 1x1 conv is a plain channel matmul: ``y = x @ W.T`` — this maps straight onto
the MXU.  logdet contribution is ``slogdet(W) * H * W`` computed on-device (the
reference's CPU round-trip at Permutations.py:70 is a CUDA-era artifact; XLA's LU-based
slogdet on a CxC matrix is negligible).  The inverse applies ``inv(W)`` the same way.

The LU parametrization ``W = P L (U + diag(sign_s * exp(log_s)))`` keeps P and sign_s
fixed and makes the logdet a cheap ``sum(log_s)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


def init(key: jax.Array, num_channels: int, dtype=jnp.float32) -> dict:
    """Random orthogonal init (QR of a Gaussian), as in Glow."""
    w = np.linalg.qr(np.asarray(jax.random.normal(key, (num_channels, num_channels))))[0]
    return {"weight": jnp.asarray(w, dtype)}


def init_lu(key: jax.Array, num_channels: int, dtype=jnp.float32) -> dict:
    w = np.linalg.qr(np.asarray(jax.random.normal(key, (num_channels, num_channels))))[0]
    p, l, u = scipy.linalg.lu(w)
    s = np.diag(u)
    return {
        "p": jnp.asarray(p, dtype),  # fixed
        "sign_s": jnp.asarray(np.sign(s), dtype),  # fixed
        "l": jnp.asarray(l, dtype),
        "log_s": jnp.asarray(np.log(np.abs(s)), dtype),
        "u": jnp.asarray(np.triu(u, k=1), dtype),
    }


def _apply(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y_o = sum_i W[o, i] * x_i over the channel axis of NHWC x.

    HIGHEST precision: the invertible path must round-trip exactly; bf16 MXU passes
    (the TPU default) would break invertibility at ~1e-3.
    """
    return jnp.einsum("bhwi,oi->bhwo", x, w, precision=jax.lax.Precision.HIGHEST)


def _lu_weight(params: dict):
    c = params["l"].shape[0]
    l_mask = jnp.tril(jnp.ones((c, c), params["l"].dtype), -1)
    l = params["l"] * l_mask + jnp.eye(c, dtype=params["l"].dtype)
    u = params["u"] * l_mask.T + jnp.diag(params["sign_s"] * jnp.exp(params["log_s"]))
    return l, u


def precompute(params: dict) -> dict:
    """Attach derived inverse weight + logdet (batched over any leading stack axis).

    Moving linalg out of sequential scan bodies matters on TPU: LU factorizations
    lower to serial loops, so 13 in-scan ``inv`` calls cost far more than one batched
    call over a (13, C, C) stack — and for serving, attaching these to the params once
    removes them from the hot path entirely.
    """
    if "weight" not in params:
        return params
    w = params["weight"]
    return {**params, "w_inv": jnp.linalg.inv(w), "logdet_w": jnp.linalg.slogdet(w)[1]}


def forward(params: dict, x: jnp.ndarray, logdet=None):
    H, W = x.shape[1], x.shape[2]
    if "weight" in params:
        w = params["weight"]
        y = _apply(w, x)
        if logdet is not None:
            ld_w = params.get("logdet_w")
            if ld_w is None:
                ld_w = jnp.linalg.slogdet(w)[1]
            logdet = logdet + ld_w * (H * W)
    else:
        l, u = _lu_weight(params)
        w = params["p"] @ l @ u
        y = _apply(w, x)
        if logdet is not None:
            logdet = logdet + jnp.sum(params["log_s"]) * (H * W)
    return y, logdet


def inverse(params: dict, y: jnp.ndarray, logdet=None):
    H, W = y.shape[1], y.shape[2]
    if "weight" in params:
        w = params["weight"]
        w_inv = params.get("w_inv")
        if w_inv is None:
            w_inv = jnp.linalg.inv(w)
        x = _apply(w_inv, y)
        if logdet is not None:
            ld_w = params.get("logdet_w")
            if ld_w is None:
                ld_w = jnp.linalg.slogdet(w)[1]
            logdet = logdet - ld_w * (H * W)
    else:
        l, u = _lu_weight(params)
        w_inv = jnp.linalg.inv(u) @ jnp.linalg.inv(l) @ jnp.linalg.inv(params["p"])
        x = _apply(w_inv, y)
        if logdet is not None:
            logdet = logdet - jnp.sum(params["log_s"]) * (H * W)
    return x, logdet
