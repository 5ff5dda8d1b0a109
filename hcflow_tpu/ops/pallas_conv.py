"""Pallas TPU kernels for the conv-heavy hot path.

A 3x3 'same' conv implemented as in-kernel im2col + one (HW, 9C) @ (9C, N) MXU dot,
gridded over (batch, H-tiles) with Element-indexed overlapping halo slabs.

Measured verdict on v5e (kept for the record): at this model's shapes (C=32..192)
XLA's native conv lowering (~34 TFLOP/s bf16) already sits near the lane-limited
roofline for 32/64-channel tensors, and this kernel does NOT beat it (~12 TFLOP/s —
the misaligned 64-lane patch concats dominate).  It is therefore NOT on the default
path; it is kept as a correct, tested building block for future kernel work (e.g.
whole-RDB fusion with channel-padded layouts) and as a worked example of
Element-indexed halo pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(H: int, W: int, C: int, N: int, budget_bytes: int = 9_000_000) -> int:
    """Largest divisor TH of H whose working set fits the VMEM budget."""
    for th in sorted({d for d in range(1, H + 1) if H % d == 0}, reverse=True):
        in_b = (th + 2) * (W + 2) * C * 2
        out_b = th * W * N * 4 * 2  # out block + accumulator
        if in_b + out_b + 9 * C * N * 2 <= budget_bytes:
            return th
    return 1


def _conv3x3_kernel(x_ref, w_ref, b_ref, out_ref, *, TH, W, C, N, relu, alpha):
    """x_ref (1, TH+2, W+2, C) zero-padded slab; w_ref (9C, N); out (1, TH, W, N).

    In-kernel im2col: one (TH*W, 9C) patch buffer then a single K=9C MXU dot —
    far better systolic utilization than 9 separate K=C dots.
    """
    patches = jnp.concatenate(
        [
            x_ref[0, dy : dy + TH, dx : dx + W, :].reshape(TH * W, C)
            for dy in range(3)
            for dx in range(3)
        ],
        axis=1,
    )
    acc = jnp.dot(patches, w_ref[...], preferred_element_type=jnp.float32)
    if b_ref is not None:
        acc = acc + b_ref[0]
    if relu:
        acc = jnp.where(acc >= 0, acc, alpha * acc)
    out_ref[0] = acc.reshape(TH, W, N)


@functools.partial(jax.jit, static_argnames=("relu", "alpha", "interpret"))
def conv3x3_pallas(x, w, b=None, relu: bool = False, alpha: float = 0.2, interpret: bool = False):
    """'same'-padded 3x3 conv on NHWC via Pallas; optional fused leaky-relu.

    x: (B, H, W, C) — cast to bf16 internally; w: (3, 3, C, N); b: (N,) or None.
    Output f32 (MXU accumulate).
    """
    B, H, W, C = x.shape
    N = w.shape[3]
    TH = _pick_tile(H, W, C, N)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.astype(jnp.bfloat16).reshape(9 * C, N)
    args = [xp, w9]
    in_specs = [
        # overlapping H slabs (1-row halo each side): Element (offset) indexing
        pl.BlockSpec(
            (pl.Element(1), pl.Element(TH + 2), pl.Element(W + 2), pl.Element(C)),
            lambda i, j: (i, j * TH, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((9 * C, N), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    if b is not None:
        args.append(b.astype(jnp.float32).reshape(1, N))
        in_specs.append(pl.BlockSpec((1, N), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
        kernel = functools.partial(
            _conv3x3_kernel, TH=TH, W=W, C=C, N=N, relu=relu, alpha=alpha
        )
    else:
        kernel = functools.partial(
            lambda x_ref, w_ref, out_ref, **kw: _conv3x3_kernel(
                x_ref, w_ref, None, out_ref, **kw
            ),
            TH=TH, W=W, C=C, N=N, relu=relu, alpha=alpha,
        )
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, W, N), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, N), jnp.float32),
        interpret=interpret,
    )(*args)
