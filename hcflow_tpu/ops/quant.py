"""Straight-through-estimator quantization.

Behavioral reference: /root/reference/codes/models/modules/Basic.py:186-202 (Quant /
Quantization): clamp to [0,1], round to 1/255 steps on the forward pass; the backward
pass is the identity (gradients flow through the rounding unchanged).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def quantize_ste(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.round(x * 255.0) / 255.0


def _quantize_fwd(x):
    return quantize_ste(x), None


def _quantize_bwd(_, g):
    return (g,)


quantize_ste.defvjp(_quantize_fwd, _quantize_bwd)
