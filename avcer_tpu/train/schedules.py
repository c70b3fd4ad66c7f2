"""Learning-rate schedules.

Contract: CosineAnnealingWarmRestarts stepped per-batch with the fractional
epoch ``epoch + idx / iters`` (/root/reference/src/audio/net_trainer/
net_trainer.py:437, constructed train_c_audio.py:248-250 with T_0=10).

torch semantics (T_mult == 1):
    T_cur = frac_epoch % T_0
    lr = eta_min + (base_lr - eta_min) * (1 + cos(pi * T_cur / T_0)) / 2
For T_mult > 1 the restart period grows geometrically.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def cosine_warm_restarts(
    base_lr: float,
    t0: int,
    iters_per_epoch: int,
    t_mult: int = 1,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """optax schedule over the global step count; fractional epoch =
    step / iters_per_epoch (matching the reference's per-batch stepping)."""

    def schedule(step) -> jnp.ndarray:
        frac_epoch = step / iters_per_epoch
        if t_mult == 1:
            t_cur = jnp.mod(frac_epoch, t0)
            t_i = t0
        else:
            # n = floor(log_{t_mult}(frac/t0 * (m-1) + 1))
            n = jnp.floor(
                jnp.log(frac_epoch / t0 * (t_mult - 1) + 1) / math.log(t_mult)
            )
            start = t0 * (t_mult**n - 1) / (t_mult - 1)
            t_i = t0 * t_mult**n
            t_cur = frac_epoch - start
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2

    return schedule


def make_optimizer(
    lr: float,
    t0: int,
    iters_per_epoch: int,
    t_mult: int = 1,
    eta_min: float = 0.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam(lr=1e-4) + warm-restart cosine (train_c_audio.py:246-250)."""
    sched = cosine_warm_restarts(lr, t0, iters_per_epoch, t_mult, eta_min)
    if weight_decay > 0:
        return optax.adamw(sched, weight_decay=weight_decay)
    return optax.adam(sched)
