"""Shared helpers for the Pallas kernels (channels-in-sublanes layout).

Both serving kernels (pallas_chain.py, pallas_rdb.py) express 3x3 'same' convs on
(C, H*W) arrays as 9 rolled-and-masked taps: tap t=(dy,dx) reads position
n + dy*W + dx, with a boundary mask emulating zero padding.  Rolls are lane
rotations (Mosaic requires 32-bit data — upcast bf16 before rolling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def make_tap_masks(H: int, W: int):
    """9 boundary masks (1, H*W) f32 for taps in (dy, dx) row-major order."""
    N = H * W
    n_idx = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    col, row = n_idx % W, n_idx // W
    masks = []
    for t in range(9):
        dy, dx = t // 3 - 1, t % 3 - 1
        m = (col + dx >= 0) & (col + dx < W) & (row + dy >= 0) & (row + dy < H)
        masks.append(m.astype(jnp.float32))
    return masks


def tap_roll(x, t: int, H: int, W: int):
    """Roll so out[n] = x[n + dy*W + dx] (caller applies the matching mask)."""
    N = H * W
    dy, dx = t // 3 - 1, t % 3 - 1
    off = dy * W + dx
    return pltpu.roll(x, (-off) % N, 1) if off else x
