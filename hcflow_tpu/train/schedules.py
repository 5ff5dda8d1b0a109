"""LR schedules matching the reference's MultiStepLR_Restart / CosineAnnealingLR_Restart.

Behavioral reference: /root/reference/codes/models/lr_scheduler.py:8-64.  Implemented
as pure step -> lr functions (optax schedule protocol), traceable under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def multistep_restart(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.5,
    restarts: Optional[Sequence[int]] = None,
    restart_weights: Optional[Sequence[float]] = None,
):
    """lr = base * weight(last restart) * gamma^(#milestones passed since restart=never).

    The reference decays at every milestone and, at a restart step, resets the decay
    and scales base_lr by the restart weight (lr_scheduler.py:20-32).
    """
    milestones = jnp.asarray(list(milestones), jnp.int32) if milestones else None
    restarts = list(restarts) if restarts else []
    restart_weights = list(restart_weights) if restart_weights else [1.0] * len(restarts)

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        lr = jnp.asarray(base_lr, jnp.float32)
        if milestones is not None:
            n = jnp.sum(step >= milestones)
            lr = lr * gamma**n
        for r, w in zip(restarts, restart_weights):
            lr = jnp.where(step >= r, jnp.asarray(base_lr * w, jnp.float32), lr)
            # milestones after a restart re-apply on top of the restarted base
            if milestones is not None:
                n_after = jnp.sum(jnp.logical_and(milestones > r, step >= milestones))
                lr = jnp.where(step >= r, base_lr * w * gamma**n_after, lr)
        return lr

    return schedule


def cosine_restart(
    base_lr: float,
    periods: Sequence[int],
    eta_min: float = 1e-8,
    restart_weights: Optional[Sequence[float]] = None,
):
    """Cosine annealing over successive periods with per-restart weights."""
    periods = list(periods)
    restart_weights = list(restart_weights) if restart_weights else [1.0] * len(periods)
    starts = [0]
    for p in periods[:-1]:
        starts.append(starts[-1] + p)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(eta_min, jnp.float32)
        for start, period, w in zip(starts, periods, restart_weights):
            t = jnp.clip((step - start) / period, 0.0, 1.0)
            cur = eta_min + 0.5 * (base_lr * w - eta_min) * (1 + jnp.cos(jnp.pi * t))
            lr = jnp.where(step >= start, cur, lr)
        return lr

    return schedule


def with_warmup(schedule, warmup_iter: int):
    """Linear LR warmup over the first warmup_iter steps (base_model.py:53-65)."""

    def warmed(step):
        lr = schedule(step)
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / max(warmup_iter, 1), 0.0, 1.0)
        return lr * frac

    return warmed


def restart_steps(train_opt: dict):
    """Steps at which ``clear_state`` resets optimizer moments.

    Reference lr_scheduler.py:9-24: restarts are stored shifted by +1 and the
    state is cleared when the scheduler's step counter hits them — i.e. at the
    training iteration numbered ``restart + 1`` (1-based, matching our ``step``
    counter which is incremented before the optimizer update).

    DELIBERATE DEVIATION (documented in PARITY.md): the reference implements
    clear_state only for MultiStepLR_Restart (HCFlow_SR_model.py:141-146 never
    passes it to the cosine scheduler).  We honor it for the cosine scheme too,
    keyed on the config's ``restarts`` list when present (the reference's
    cosine configs carry explicit ``restarts`` at the T_period boundaries),
    falling back to cumulative T_period boundaries otherwise.
    """
    if not train_opt.get("clear_state"):
        return frozenset()
    restarts = train_opt.get("restarts") or []
    if restarts:
        return frozenset(int(r) + 1 for r in restarts)
    if train_opt.get("lr_scheme") == "CosineAnnealingLR_Restart":
        periods = list(train_opt.get("T_period") or [])
        acc, steps = 0, []
        for p_ in periods[:-1]:
            acc += p_
            steps.append(acc + 1)
        return frozenset(steps)
    return frozenset()


def schedule_from_opt(train_opt: dict):
    """Build the configured schedule from a parsed ``train`` option section."""
    base_lr = train_opt.get("lr_G", 2.5e-4)
    scheme = train_opt.get("lr_scheme", "MultiStepLR")
    if scheme == "CosineAnnealingLR_Restart":
        sched = cosine_restart(
            base_lr,
            train_opt.get("T_period", [train_opt.get("niter", 100000)]),
            eta_min=train_opt.get("eta_min", 1e-8),
            restart_weights=train_opt.get("restart_weights"),
        )
    else:
        sched = multistep_restart(
            base_lr,
            train_opt.get("lr_steps") or [],
            gamma=train_opt.get("lr_gamma", 0.5),
            restarts=train_opt.get("restarts"),
            restart_weights=train_opt.get("restart_weights"),
        )
    warmup = train_opt.get("warmup_iter") or 0
    if warmup and warmup > 0:
        sched = with_warmup(sched, warmup)
    return sched
