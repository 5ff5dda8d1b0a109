"""Diagonal Gaussian / Laplace densities over NHWC feature maps.

Behavioral reference: /root/reference/codes/models/modules/Basic.py:75-124
(GaussianDiag / LaplaceDiag).  logp sums the per-element log-likelihood over the
(H, W, C) axes, returning one scalar per batch element.  ``sample`` draws
``mean + exp(logs) * eps`` with ``eps ~ N(0, eps_std^2)`` — the temperature knob
used by the reverse flow.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)
LOG_2 = math.log(2.0)

_FEATURE_AXES = (1, 2, 3)  # H, W, C of an NHWC tensor


def gaussian_likelihood(mean, logs, x):
    """Elementwise log N(x; mean, exp(logs)^2)."""
    if mean is None and logs is None:
        return -0.5 * (x**2 + LOG_2PI)
    return -0.5 * (logs * 2.0 + ((x - mean) ** 2) * jnp.exp(-2.0 * logs) + LOG_2PI)


def gaussian_logp(mean, logs, x):
    """Sum of elementwise Gaussian log-likelihood over (H, W, C); shape (B,)."""
    return jnp.sum(gaussian_likelihood(mean, logs, x), axis=_FEATURE_AXES)


def gaussian_sample(key: jax.Array, mean, logs, eps_std) -> jnp.ndarray:
    """mean + exp(logs) * eps with eps ~ N(0, eps_std^2). eps_std may be a traced scalar."""
    eps = jax.random.normal(key, mean.shape, dtype=mean.dtype) * eps_std
    return mean + jnp.exp(logs) * eps


def laplace_likelihood(mean, logs, x):
    if mean is None and logs is None:
        return -(jnp.abs(x) + LOG_2)
    return -(logs + jnp.abs(x - mean) * jnp.exp(-logs) + LOG_2)


def laplace_logp(mean, logs, x):
    return jnp.sum(laplace_likelihood(mean, logs, x), axis=_FEATURE_AXES)
