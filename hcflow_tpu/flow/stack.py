"""Homogeneous flow-step sequences as lax.scan over stacked parameter pytrees.

The reference executes its K identical FlowSteps as a Python loop over nn.Modules
(FlowNet_SR_x4.py:84-101).  On TPU we instead stack the per-step parameters along a
leading axis and run a single ``lax.scan``: one compiled step body, K iterations —
drastically faster XLA compiles and identical math.  The inverse is the same scan with
``reverse=True`` over per-step inverses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .flowstep import FlowStepSpec


def init_stack(spec: FlowStepSpec, key: jax.Array, n_steps: int, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, n_steps)
    per = [spec.init(k, dtype) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per)


def stack_size(stacked) -> int:
    return jax.tree.leaves(stacked)[0].shape[0]


def unstack(stacked, i: int):
    return jax.tree.map(lambda x: x[i], stacked)


def restack(per_step_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_step_list)


def _augment_invconv(stacked: dict, need_inv: bool, need_logdet: bool) -> dict:
    """Batch-precompute invconv derived values over the stack axis (one LU for all
    steps instead of one per scan iteration — TPU LU lowers to serial loops)."""
    inv = stacked.get("invconv")
    if inv is None or "weight" not in inv:
        return stacked
    aug = dict(inv)
    if need_logdet and "logdet_w" not in inv:
        aug["logdet_w"] = jnp.linalg.slogdet(inv["weight"])[1]
    if need_inv and "w_inv" not in inv:
        aug["w_inv"] = jnp.linalg.inv(inv["weight"])
    return {**stacked, "invconv": aug}


def _maybe_remat(fn, remat: bool):
    return jax.checkpoint(fn) if remat else fn


def forward_stack(spec: FlowStepSpec, stacked: dict, z: jnp.ndarray, u=None, logdet=None,
                  unroll: int = 1, remat: bool = False):
    """Run all stacked steps forward. logdet must be a (B,) array (not None).

    unroll > 1 lets XLA fuse across steps (the per-step work is small after cond
    hoisting); remat=True rematerializes each step on the backward pass (memory for
    160px training).
    """
    stacked = _augment_invconv(stacked, need_inv=False, need_logdet=True)

    @lambda f: _maybe_remat(f, remat)
    def body(carry, p):
        z, ld = carry
        z, ld = spec.forward(p, z, u, ld)
        return (z, ld), None

    (z, logdet), _ = lax.scan(body, (z, logdet), stacked, unroll=unroll)
    return z, logdet


def inverse_stack(spec: FlowStepSpec, stacked: dict, z: jnp.ndarray, u=None, logdet=None,
                  unroll: int = 1, remat: bool = False):
    stacked = _augment_invconv(stacked, need_inv=True, need_logdet=True)

    @lambda f: _maybe_remat(f, remat)
    def body(carry, p):
        z, ld = carry
        z, ld = spec.inverse(p, z, u, ld)
        return (z, ld), None

    (z, logdet), _ = lax.scan(body, (z, logdet), stacked, reverse=True, unroll=unroll)
    return z, logdet


def compute_u_contribs(spec: FlowStepSpec, stacked: dict, u: jnp.ndarray) -> jnp.ndarray:
    """Precompute all K steps' conv1 cond-contributions as ONE wide conv.

    The per-step coupling conv1 sees cat(z1, u) where u (the cond features, e.g. 128
    channels) dwarfs z1 (3-10 channels).  Since u is identical for every step and
    conv1 is linear and bias-free, all K contributions are one conv with the K
    weight slices concatenated along the output axis — a single large MXU matmul
    instead of K sequential narrow ones inside the scan.

    Returns (K, B, H, W, hidden) to be scanned alongside the stacked params.
    """
    from ..ops import nets

    w = stacked["coupling"]["f"]["conv1"]["w"]  # (K, kh, kw, fin, hidden)
    K, kh, kw, fin, hidden = w.shape
    cond = spec.cond_channels
    w_u = w[:, :, :, fin - cond :, :]  # (K, kh, kw, cond, hidden)
    w_wide = jnp.transpose(w_u, (1, 2, 3, 0, 4)).reshape(kh, kw, cond, K * hidden)
    uc = nets.conv2d(u, w_wide, compute_dtype=spec.compute_dtype)  # (B, H, W, K*hidden)
    B, H, W, _ = uc.shape
    return jnp.transpose(uc.reshape(B, H, W, K, hidden), (3, 0, 1, 2, 4))


def compute_u_contribs_packed(spec: FlowStepSpec, stacked: dict, u: jnp.ndarray,
                              n_pad: int, dtype) -> jnp.ndarray:
    """compute_u_contribs staged for the fused Pallas chain: (B*K, hidden, n_pad).

    Same one-wide-conv math, but the result goes straight to the kernel's HBM
    layout (channels-in-sublanes, spatial-in-lanes, lane dim padded to the DMA
    tile) with a single low-precision transpose instead of two f32 ones.
    """
    from ..ops import nets

    w = stacked["coupling"]["f"]["conv1"]["w"]  # (K, kh, kw, fin, hidden)
    K, kh, kw, fin, hidden = w.shape
    cond = spec.cond_channels
    w_u = w[:, :, :, fin - cond :, :]
    w_wide = jnp.transpose(w_u, (1, 2, 3, 0, 4)).reshape(kh, kw, cond, K * hidden)
    uc = nets.conv2d(u, w_wide, compute_dtype=spec.compute_dtype)  # (B,H,W,K*hid)
    B, H, W, _ = uc.shape
    N = H * W
    uc = uc.astype(dtype).reshape(B, N, K, hidden)
    uc = jnp.transpose(uc, (0, 2, 3, 1))  # (B, K, hidden, N)
    if n_pad != N:
        uc = jnp.pad(uc, ((0, 0), (0, 0), (0, 0), (0, n_pad - N)))
    return uc.reshape(B * K, hidden, n_pad)


def forward_stack_hoisted(spec: FlowStepSpec, stacked: dict, z, u, logdet,
                          unroll: int = 1, remat: bool = False):
    stacked = _augment_invconv(stacked, need_inv=False, need_logdet=True)
    u_contribs = compute_u_contribs(spec, stacked, u)

    @lambda f: _maybe_remat(f, remat)
    def body(carry, inp):
        p, uc = inp
        z, ld = carry
        z, ld = spec.forward_hoisted(p, z, uc, ld)
        return (z, ld), None

    (z, logdet), _ = lax.scan(body, (z, logdet), (stacked, u_contribs), unroll=unroll)
    return z, logdet


def inverse_stack_hoisted(spec: FlowStepSpec, stacked: dict, z, u, logdet,
                          unroll: int = 1, remat: bool = False):
    stacked = _augment_invconv(stacked, need_inv=True, need_logdet=True)
    u_contribs = compute_u_contribs(spec, stacked, u)

    @lambda f: _maybe_remat(f, remat)
    def body(carry, inp):
        p, uc = inp
        z, ld = carry
        z, ld = spec.inverse_hoisted(p, z, uc, ld)
        return (z, ld), None

    (z, logdet), _ = lax.scan(body, (z, logdet), (stacked, u_contribs), reverse=True,
                              unroll=unroll)
    return z, logdet


def calibrate_stack(
    spec: FlowStepSpec, stacked: dict, z: jnp.ndarray, u=None, logdet: Optional[jnp.ndarray] = None
):
    """Sequential data-dependent init across the stack (one-time, outside jit)."""
    n = stack_size(stacked)
    new_steps = []
    for i in range(n):
        p, z, logdet = spec.calibrate(unstack(stacked, i), z, u, logdet)
        new_steps.append(p)
    return restack(new_steps), z, logdet
