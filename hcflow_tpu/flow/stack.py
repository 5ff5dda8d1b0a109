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


def forward_stack(spec: FlowStepSpec, stacked: dict, z: jnp.ndarray, u=None, logdet=None):
    """Run all stacked steps forward. logdet must be a (B,) array (not None)."""
    stacked = _augment_invconv(stacked, need_inv=False, need_logdet=True)

    def body(carry, p):
        z, ld = carry
        z, ld = spec.forward(p, z, u, ld)
        return (z, ld), None

    (z, logdet), _ = lax.scan(body, (z, logdet), stacked)
    return z, logdet


def inverse_stack(spec: FlowStepSpec, stacked: dict, z: jnp.ndarray, u=None, logdet=None):
    stacked = _augment_invconv(stacked, need_inv=True, need_logdet=True)

    def body(carry, p):
        z, ld = carry
        z, ld = spec.inverse(p, z, u, ld)
        return (z, ld), None

    (z, logdet), _ = lax.scan(body, (z, logdet), stacked, reverse=True)
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
