"""Tiled (patch-wise) inference for very large images.

Behavioral reference: /root/reference/codes/data/util.py:489-514 (test_patchwise —
present but unused there).  TPU-first redesign: fixed-size LR tiles with overlap are
batched into ONE padded tensor and pushed through the jitted reverse flow together
(static shapes, one compile, full MXU batching), then the HR tiles are blended back
with overlap cropping.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import numpy as np


def tiled_reverse(
    reverse_fn: Callable,
    params,
    key: jax.Array,
    lr: np.ndarray,
    scale: int,
    eps_std: float,
    tile: int = 64,
    overlap: int = 8,
    batch: int = 8,
) -> np.ndarray:
    """Run reverse flow over an arbitrarily large LR image (HWC numpy in [0,1]).

    reverse_fn(params, key, lr_batch, eps_std) -> hr_batch (the jitted model.reverse).
    """
    h, w, c = lr.shape
    if h <= tile and w <= tile:
        out = reverse_fn(params, key, lr[None], eps_std)
        return np.asarray(out[0])

    stride = tile - 2 * overlap
    ny = max(1, math.ceil((h - 2 * overlap) / stride))
    nx = max(1, math.ceil((w - 2 * overlap) / stride))

    # pad so every tile is full-size (reflect, then crop at the end)
    pad_h = max(0, (ny - 1) * stride + tile - h)
    pad_w = max(0, (nx - 1) * stride + tile - w)
    lr_pad = np.pad(lr, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")

    coords = [(iy * stride, ix * stride) for iy in range(ny) for ix in range(nx)]
    tiles = np.stack([lr_pad[y : y + tile, x : x + tile] for y, x in coords])

    hr_tiles = []
    for i in range(0, len(tiles), batch):
        chunk = tiles[i : i + batch]
        n = len(chunk)
        if n < batch:  # keep the jit shape static
            chunk = np.concatenate([chunk, np.zeros((batch - n, tile, tile, c), chunk.dtype)])
        out = reverse_fn(params, jax.random.fold_in(key, i), chunk, eps_std)
        hr_tiles.append(np.asarray(out[:n]))
    hr_tiles = np.concatenate(hr_tiles)

    out = np.zeros(((h + pad_h) * scale, (w + pad_w) * scale, c), np.float32)
    s_tile, s_ov = tile * scale, overlap * scale
    for (y, x), t in zip(coords, hr_tiles):
        y0 = 0 if y == 0 else s_ov
        x0 = 0 if x == 0 else s_ov
        out[y * scale + y0 : y * scale + s_tile, x * scale + x0 : x * scale + s_tile] = t[
            y0:, x0:
        ]
    return out[: h * scale, : w * scale]
