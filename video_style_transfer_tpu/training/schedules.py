"""Learning-rate schedules matching diffusers.optimization.get_scheduler.

The reference builds its LR schedule via HF ``get_scheduler(name, ...)``
(train_unziplora.py:1894-1900, train_animatediff.py:166-171) with
``--lr_scheduler`` in {constant, constant_with_warmup, linear, cosine,
cosine_with_restarts, polynomial}, ``--lr_num_cycles`` (hard restarts,
cosine_with_restarts only) and ``--lr_power`` (polynomial only).
This module re-derives those exact step->multiplier formulas as pure
jnp functions usable as optax schedules (called with the update count
inside the jitted step — no host callbacks).
"""
from __future__ import annotations

import jax.numpy as jnp

NAMES = ("constant", "constant_with_warmup", "linear", "cosine",
         "cosine_with_restarts", "polynomial")


def make_lr_schedule(name: str, lr: float, *, warmup: int = 0,
                     total_steps: int = 1000, num_cycles: int = 1,
                     power: float = 1.0, lr_end: float = 1e-7):
    """Returns an optax schedule fn step -> learning rate.

    Formulas mirror transformers.optimization (which diffusers re-exports):
    - constant: lr (no warmup — HF's 'constant' ignores warmup too)
    - constant_with_warmup: linear 0->lr over `warmup`, then lr
    - linear: warmup, then linear lr->0 at total_steps
    - cosine: warmup, then 0.5*(1+cos(pi*2*0.5*progress)) — HF's fixed
      default num_cycles=0.5 (get_scheduler forwards --lr_num_cycles to
      cosine_with_restarts ONLY)
    - cosine_with_restarts: `num_cycles` hard restarts
    - polynomial: (lr - lr_end) * (1-progress)**power + lr_end
    """
    if name not in NAMES:
        raise ValueError(f"unknown lr_scheduler {name!r}; one of {NAMES}")
    warmup = max(int(warmup), 0)
    total = max(int(total_steps), warmup + 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(warmup > 0,
                         jnp.minimum(step / max(warmup, 1), 1.0), 1.0)
        # NOT clamped above 1: HF evaluates the formulas on raw progress
        # past num_training_steps (cosine's max(0, .) rises again there)
        progress = jnp.maximum((step - warmup) / max(total - warmup, 1),
                               0.0)
        if name == "constant":
            mult = jnp.float32(1.0)
            warm_ = jnp.float32(1.0)
        elif name == "constant_with_warmup":
            mult = jnp.float32(1.0)
            warm_ = warm
        elif name == "linear":
            mult = jnp.maximum(1.0 - progress, 0.0)
            warm_ = warm
        elif name == "cosine":
            mult = jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * 0.5 * progress)))
            warm_ = warm
        elif name == "cosine_with_restarts":
            frac = jnp.mod(num_cycles * progress, 1.0)
            mult = jnp.where(progress >= 1.0, 0.0,
                             jnp.maximum(0.0,
                                         0.5 * (1.0 + jnp.cos(jnp.pi * frac))))
            warm_ = warm
        else:  # polynomial
            decay = (lr - lr_end) * (1.0 - jnp.minimum(progress, 1.0)) \
                ** power + lr_end
            decay = jnp.where(step > total, lr_end, decay)
            return jnp.where(step < warmup, lr * warm,
                             decay).astype(jnp.float32)
        return (lr * jnp.where(step < warmup, warm_, mult)).astype(
            jnp.float32)

    return schedule
