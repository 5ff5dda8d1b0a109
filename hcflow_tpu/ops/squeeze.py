"""Volume-preserving spatial reshuffles: checkerboard squeeze and Haar wavelet.

Behavioral reference: /root/reference/codes/models/modules/Basic.py:127-184 (squeeze2d /
unsqueeze2d) and Basic.py:450-487 (HaarDownsampling).  Both are re-derived here for NHWC
layout (TPU-preferred); the channel ordering is kept bit-compatible with the reference's
NCHW convention so converted checkpoints line up:

- squeeze: output channel index = c * 4 + fh * 2 + fw   (channel-major)
- haar:    output channel index = k * C + c             (filter-major), with the four
  orthogonal Haar filters k in order (LL, -cols, -rows, -diag), all scaled by 1/4 on the
  forward pass.  Forward/backward are exact inverses (the filter matrix F satisfies
  (F/4)^-1 = F^T).

Both are volume-preserving (logdet contribution is zero), so they only transform z and
pass logdet through.
"""

from __future__ import annotations

import jax.numpy as jnp


def squeeze2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Space-to-depth on NHWC. (B,H,W,C) -> (B,H/f,W/f,C*f*f), channel-major order."""
    if factor == 1:
        return x
    B, H, W, C = x.shape
    assert H % factor == 0 and W % factor == 0, (H, W, factor)
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    # -> (B, H/f, W/f, C, fh, fw) so flattened channel = c*f*f + fh*f + fw
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, H // factor, W // factor, C * factor * factor)


def unsqueeze2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Depth-to-space on NHWC; inverse of :func:`squeeze2d`."""
    if factor == 1:
        return x
    B, H, W, C = x.shape
    f2 = factor * factor
    assert C % f2 == 0, C
    x = x.reshape(B, H, W, C // f2, factor, factor)
    # (B, H, fh?, ...) -> interleave spatial: (B, H, fh, W, fw, C')
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * factor, W * factor, C // f2)


def haar_squeeze2d(x: jnp.ndarray) -> jnp.ndarray:
    """Orthogonal Haar downsampling on NHWC. (B,H,W,C) -> (B,H/2,W/2,4C), filter-major.

    Expressed as elementwise combinations of the four pixels of each 2x2 block — this
    lowers to pure VPU code on TPU (no conv needed).
    """
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    b = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    x00 = b[:, :, :, 0, 0, :]
    x01 = b[:, :, :, 0, 1, :]
    x10 = b[:, :, :, 1, 0, :]
    x11 = b[:, :, :, 1, 1, :]
    f0 = (x00 + x01 + x10 + x11) * 0.25
    f1 = (x00 - x01 + x10 - x11) * 0.25
    f2 = (x00 + x01 - x10 - x11) * 0.25
    f3 = (x00 - x01 - x10 + x11) * 0.25
    out = jnp.stack([f0, f1, f2, f3], axis=3)  # (B, H/2, W/2, 4, C)
    return out.reshape(B, H // 2, W // 2, 4 * C)


def haar_unsqueeze2d(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`haar_squeeze2d`."""
    B, H, W, C4 = x.shape
    assert C4 % 4 == 0, C4
    C = C4 // 4
    f = x.reshape(B, H, W, 4, C)
    f0, f1, f2, f3 = f[:, :, :, 0, :], f[:, :, :, 1, :], f[:, :, :, 2, :], f[:, :, :, 3, :]
    x00 = f0 + f1 + f2 + f3
    x01 = f0 - f1 + f2 - f3
    x10 = f0 + f1 - f2 - f3
    x11 = f0 - f1 - f2 + f3
    blocks = jnp.stack(
        [jnp.stack([x00, x01], axis=3), jnp.stack([x10, x11], axis=3)], axis=3
    )  # (B, H, W, 2, 2, C)
    out = blocks.transpose(0, 1, 3, 2, 4, 5)  # (B, H, 2, W, 2, C)
    return out.reshape(B, H * 2, W * 2, C)


def nearest_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbour upsample on NHWC (matches F.interpolate(mode='nearest'))."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)
