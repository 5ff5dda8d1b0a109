"""Train-step factories: jitted substeps mirroring the reference's pass structure.

Behavioral reference: /root/reference/codes/models/HCFlow_SR_model.py:184-294 and
HCFlow_Rescaling_model.py:204-297.

The SR trainer keeps the reference's *three separate G updates per iteration* — this is
semantically load-bearing (each pass uses a different eps_std, and separate updates
reduce peak memory; HCFlow_SR_model.py:205):

1. NLL pass:     forward flow, nll loss, update.
2. Pixel pass:   reverse at eps_std=0, L1/L2 vs HR, update (HCFlow+).
3. Fea/GAN pass: reverse at eps_std_reverse, perceptual + adversarial, update (++).
4. D pass:       discriminator update on real/fake.

All optimizer transforms are wrapped in ``optax.apply_if_finite`` — the JAX analogue of
the reference's per-loss NaN guards (skip the step, keep state).  Grad clipping is
by-value(5) then by-global-norm(100), as in gradient_clip (HCFlow_SR_model.py:289-294).

The rescaling trainer is a single joint step differentiating forward AND inverse flow
through the STE quantization (HCFlow_Rescaling_model.py:214-232).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _scale_by_iteration_schedule(schedule) -> optax.GradientTransformationExtraArgs:
    """Final -lr scaling driven by an externally supplied iteration index.

    The LR is ``schedule(step)`` where ``step`` arrives as an extra update arg
    (``TrainState.step``, advanced once per *training iteration* by the NLL/D
    pass only), matching the reference's torch semantics where scheduler.step()
    runs once per iteration regardless of how many optimizer.step() calls the
    HCFlow+/++ multi-pass loop makes (HCFlow_SR_model.py:205 three G updates/it)
    and where clear_state (lr_scheduler.py:23-24) resets optimizer moments but
    never rewinds the scheduler.  An optax-internal schedule count would get
    both wrong: it advances per tx.update (2-3x/iteration) and is zeroed by
    tx.init at a clear_state restart.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None, *, step, **extra):
        del params, extra
        lr = schedule(step)
        return jax.tree.map(lambda u: -lr * u, updates), state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def make_optimizer(train_opt: dict, schedule) -> optax.GradientTransformation:
    clip_val = train_opt.get("max_grad_clip")
    clip_norm = train_opt.get("max_grad_norm")
    wd = train_opt.get("weight_decay_G", 0) or 0
    chain = []
    if clip_val:
        chain.append(optax.clip(clip_val))
    if clip_norm:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if wd:
        # pre-adam, i.e. torch Adam weight_decay semantics (grad += wd * param)
        chain.append(optax.add_decayed_weights(wd))
    chain.append(
        optax.scale_by_adam(b1=train_opt.get("beta1", 0.9), b2=train_opt.get("beta2", 0.99))
    )
    chain.append(_scale_by_iteration_schedule(schedule))
    return optax.apply_if_finite(optax.chain(*chain), max_consecutive_errors=10**6)


def make_d_optimizer(train_opt: dict, schedule) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.scale_by_adam(
            b1=train_opt.get("beta1_D", 0.9), b2=train_opt.get("beta2_D", 0.99)
        ),
        _scale_by_iteration_schedule(schedule),
    )
    return optax.apply_if_finite(tx, max_consecutive_errors=10**6)


def init_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def _apply(tx, state: TrainState, grads, advance_step: bool) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params, step=state.step)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(
        step=state.step + (1 if advance_step else 0), params=new_params, opt_state=new_opt
    )


# ---------------------------------------------------------------------- SR steps
def make_sr_nll_step(model, tx, nll_weight: float = 1.0):
    """G pass 1: forward-flow NLL (HCFlow_SR_model.py:195-203)."""

    def step(state: TrainState, key, hr, lr):
        def loss_fn(p):
            _, nll = model.forward(p, key, hr, lr)
            return nll_weight * nll, nll

        (_, nll), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        return _apply(tx, state, grads, advance_step=True), {"nll": nll, "grad_norm": gnorm}

    return jax.jit(step, donate_argnums=(0,))


def _clip_global_norm(grads, max_norm):
    g = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (g + 1e-12))
    return jax.tree.map(lambda x: x * scale, grads)


def make_sr_pixel_step(model, tx, pixel_weight: float, criterion: Callable,
                       warmup_steps: int = 0, warmup_start: int = 0,
                       reverse_grad_clip: Optional[float] = None):
    """G pass 2: reverse at eps_std=0 + HR pixel loss (HCFlow_SR_model.py:207-218).

    Two config-gated stabilizers (documented DEVIATIONS from the reference, off
    by default — BENCHMARKS.md "HCFlow+ fine-tune"): ``warmup_steps`` ramps the
    pixel weight linearly from 0 over that many steps after ``warmup_start``, and
    ``reverse_grad_clip`` clips the global norm of the gradients flowing through
    the inverse flow before the optimizer sees them.  Both damp the early
    reverse-leg gradients that can push couplings off the invertible manifold
    faster than the NLL anchor recovers at small data scale."""

    def step(state: TrainState, key, hr, lr):
        ramp = 1.0
        if warmup_steps:
            ramp = jnp.clip(
                (state.step - warmup_start) / float(warmup_steps), 0.0, 1.0
            )

        def loss_fn(p):
            fake_h = model.reverse(p, key, lr, 0.0)
            return pixel_weight * ramp * criterion(fake_h, hr)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if reverse_grad_clip:
            grads = _clip_global_norm(grads, reverse_grad_clip)
        return _apply(tx, state, grads, advance_step=False), {"l_g_pix_hr": loss}

    return jax.jit(step, donate_argnums=(0,))


def make_sr_feagan_step(
    model,
    tx,
    eps_std_reverse: float,
    gan_type: str = "gan",
    gan_weight: float = 0.0,
    fea_weight: float = 0.0,
    fea_criterion: Optional[Callable] = None,
    d_apply: Optional[Callable] = None,
    f_apply: Optional[Callable] = None,
    reverse_grad_clip: Optional[float] = None,
):
    """G pass 3: reverse at eps_std_reverse + perceptual/GAN (HCFlow_SR_model.py:223-254).

    Returns (new_state, fake_h, metrics); fake_h is reused by the D step.
    ``reverse_grad_clip`` — same config-gated stabilizer as make_sr_pixel_step.
    """
    from .losses import gan_loss

    def step(state: TrainState, key, hr, lr, d_params, f_params):
        def loss_fn(p):
            fake_h = model.reverse(p, key, lr, eps_std_reverse)
            total = 0.0
            metrics = {}
            if fea_weight and f_apply is not None:
                real_fea = jax.lax.stop_gradient(f_apply(f_params, hr))
                fake_fea = f_apply(f_params, fake_h)
                l_fea = fea_weight * fea_criterion(fake_fea, real_fea)
                total = total + l_fea
                metrics["l_g_fea"] = l_fea
            if gan_weight and d_apply is not None:
                pred_fake = d_apply(d_params, fake_h)
                if gan_type == "ragan":
                    pred_real = jax.lax.stop_gradient(d_apply(d_params, hr))
                    l_gan = (
                        gan_loss("ragan", pred_real - jnp.mean(pred_fake), False)
                        + gan_loss("ragan", pred_fake - jnp.mean(pred_real), True)
                    ) / 2.0
                else:
                    l_gan = gan_loss(gan_type, pred_fake, True)
                l_gan = gan_weight * l_gan
                total = total + l_gan
                metrics["l_g_gan"] = l_gan
            return total, (fake_h, metrics)

        (_, (fake_h, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if reverse_grad_clip:
            grads = _clip_global_norm(grads, reverse_grad_clip)
        return _apply(tx, state, grads, advance_step=False), fake_h, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_d_step(d_apply, d_tx, gan_type: str = "gan"):
    """D pass: real/fake discriminator update (HCFlow_SR_model.py:256-287)."""
    from .losses import gan_loss

    def step(d_state: TrainState, hr, fake_h):
        fake_h = jax.lax.stop_gradient(fake_h)

        def loss_fn(dp):
            pred_real = d_apply(dp, hr)
            pred_fake = d_apply(dp, fake_h)
            if gan_type == "ragan":
                l_real = gan_loss("ragan", pred_real - jnp.mean(pred_fake), True)
                l_fake = gan_loss("ragan", pred_fake - jnp.mean(pred_real), False)
                total = (l_real + l_fake) / 2.0
            else:
                l_real = gan_loss(gan_type, pred_real, True)
                l_fake = gan_loss(gan_type, pred_fake, False)
                total = l_real + l_fake
            return total, {
                "l_d_real": l_real,
                "l_d_fake": l_fake,
                "D_real": jnp.mean(pred_real),
                "D_fake": jnp.mean(pred_fake),
            }

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_state.params)
        return _apply(d_tx, d_state, grads, advance_step=True), metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------- rescaling step
def make_rescaling_step(
    model,
    tx,
    weight_lr: float,
    weight_z: float,
    weight_hr: float,
    eps_std_reverse: float = 1.0,
    lr_criterion: Optional[Callable] = None,
    hr_criterion: Optional[Callable] = None,
    gan_type: str = "gan",
    gan_weight: float = 0.0,
    fea_weight: float = 0.0,
    fea_criterion: Optional[Callable] = None,
    d_apply: Optional[Callable] = None,
    f_apply: Optional[Callable] = None,
):
    """Joint fwd+inv update through STE quantization (HCFlow_Rescaling_model.py:204-264).

    loss = w_lr * L2(fake_LR, bicubic_LR) + w_z * mean(z^2)
         + w_hr * L1(reverse(quant(fake_LR)), HR)
    Each term is finite-guarded individually (replaced by 0), matching the reference's
    torch.isfinite gates at :223-228; remat on the inverse leg bounds peak memory.

    Optional fea/GAN heads (HCFlow_Rescaling_model.py:237-262): unlike the SR
    trainer's separate third pass, the reference's rescaling trainer adds the
    perceptual and adversarial terms to the SAME single G backward, reusing the
    joint pass's fake_H.  When either head is active the returned step has
    signature ``step(state, key, hr, lr, d_params, f_params) ->
    (state, fake_hr, metrics)`` so the caller can feed fake_hr to the D update;
    otherwise the bare ``step(state, key, hr, lr) -> (state, metrics)``.
    """
    from ..ops.quant import quantize_ste
    from .losses import gan_loss, l1, l2

    lr_criterion = lr_criterion or l2
    hr_criterion = hr_criterion or l1
    reverse_remat = jax.checkpoint(lambda p, k, z, e: model.reverse(p, k, z, e))
    has_heads = bool((fea_weight and f_apply is not None)
                     or (gan_weight and d_apply is not None))

    def _finite(x):
        return jnp.where(jnp.isfinite(x), x, 0.0)

    def _joint_terms(p, key, hr, lr):
        fake_lr, fake_zs = model.forward(p, hr)
        l_lr = weight_lr * lr_criterion(fake_lr, lr)
        z_flat = jnp.concatenate([z.reshape(z.shape[0], -1) for z in fake_zs], axis=1)
        l_z = weight_z * jnp.mean(z_flat**2)
        fake_lr_q = quantize_ste(fake_lr)
        fake_hr = reverse_remat(p, key, fake_lr_q, eps_std_reverse)
        l_hr = weight_hr * hr_criterion(fake_hr, hr)
        total = _finite(l_lr) + _finite(l_z) + _finite(l_hr)
        return total, fake_hr, {"l_g_lr": l_lr, "l_g_z": l_z, "l_g_hr": l_hr}

    if not has_heads:

        def step(state: TrainState, key, hr, lr):
            def loss_fn(p):
                total, _, metrics = _joint_terms(p, key, hr, lr)
                return total, metrics

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return _apply(tx, state, grads, advance_step=True), metrics

        return jax.jit(step, donate_argnums=(0,))

    def step_heads(state: TrainState, key, hr, lr, d_params, f_params):
        def loss_fn(p):
            total, fake_hr, metrics = _joint_terms(p, key, hr, lr)
            if fea_weight and f_apply is not None:
                real_fea = jax.lax.stop_gradient(f_apply(f_params, hr))
                fake_fea = f_apply(f_params, fake_hr)
                l_fea = fea_weight * fea_criterion(fake_fea, real_fea)
                total = total + _finite(l_fea)
                metrics["l_g_fea"] = l_fea
            if gan_weight and d_apply is not None:
                pred_fake = d_apply(d_params, fake_hr)
                if gan_type == "ragan":
                    pred_real = jax.lax.stop_gradient(d_apply(d_params, hr))
                    l_gan = (
                        gan_loss("ragan", pred_real - jnp.mean(pred_fake), False)
                        + gan_loss("ragan", pred_fake - jnp.mean(pred_real), True)
                    ) / 2.0
                else:
                    l_gan = gan_loss(gan_type, pred_fake, True)
                l_gan = gan_weight * l_gan
                total = total + _finite(l_gan)
                metrics["l_g_gan"] = l_gan
            return total, (fake_hr, metrics)

        (_, (fake_hr, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return _apply(tx, state, grads, advance_step=True), fake_hr, metrics

    return jax.jit(step_heads, donate_argnums=(0,))
