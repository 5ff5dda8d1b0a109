"""Fixed channel permutations (reverse / shuffle).

Behavioral reference: /root/reference/codes/models/modules/Permutations.py:10-30
(Permute2d).  Volume-preserving (logdet passthrough); the permutation indices are
fixed at init (reversal, or a seeded shuffle) and stored as an int32 vector in the
params so checkpoints round-trip.  Unused by the shipped configs but part of the
op inventory (FlowStep's flow_permutation options).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def init(num_channels: int, shuffle: bool = False, seed: int = 0) -> dict:
    idx = np.arange(num_channels - 1, -1, -1)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    inv = np.zeros(num_channels, np.int32)
    inv[idx] = np.arange(num_channels)
    return {"indices": jnp.asarray(idx, jnp.int32), "indices_inverse": jnp.asarray(inv)}


def forward(params: dict, x: jnp.ndarray, logdet=None):
    return jnp.take(x, params["indices"], axis=-1), logdet


def inverse(params: dict, y: jnp.ndarray, logdet=None):
    return jnp.take(y, params["indices_inverse"], axis=-1), logdet
