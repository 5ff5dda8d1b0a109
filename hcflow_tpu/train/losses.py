"""Loss functions: pixel, Charbonnier, GAN variants.

Behavioral reference: /root/reference/codes/models/loss.py (GANLoss wrapper,
CharbonnierLoss, GradientPenaltyLoss) and the criterion dispatch in
HCFlow_SR_model.py:44-98 (l1/l2 pixel + feature losses; gan/lsgan/wgangp/ragan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2(pred, target):
    return jnp.mean((pred - target) ** 2)


def charbonnier(pred, target, eps: float = 1e-6):
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps))


def pixel_criterion(name: str):
    return {"l1": l1, "l2": l2, "cb": charbonnier}[name]


# ------------------------------------------------------------------- GAN losses
def _bce_with_logits(logits, target):
    # stable: max(x,0) - x*t + log(1 + exp(-|x|))
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_loss(gan_type: str, logits, target_is_real: bool):
    """Discriminator/generator criterion on raw logits (loss.py:19-51)."""
    if gan_type in ("gan", "ragan"):
        t = 1.0 if target_is_real else 0.0
        return _bce_with_logits(logits, t)
    if gan_type == "lsgan":
        t = 1.0 if target_is_real else 0.0
        return jnp.mean((logits - t) ** 2)
    if gan_type == "wgangp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    raise NotImplementedError(f"GAN type {gan_type} is not implemented")


def gradient_penalty(d_apply, d_params, key, real, fake):
    """WGAN-GP gradient penalty on random interpolates (loss.py:54-74)."""
    alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1), real.dtype)
    interp = real * alpha + fake * (1.0 - alpha)

    def d_sum(x):
        return jnp.sum(d_apply(d_params, x))

    grads = jax.grad(d_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)
