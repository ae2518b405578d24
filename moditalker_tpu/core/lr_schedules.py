"""LR schedules matching ``MToV/tools/scheduler.py``.

The reference defines LambdaWarmUpCosineScheduler(2) and
LambdaLinearScheduler (:4-97) — multiplicative factors applied to a base LR.
These return optax schedules yielding the absolute LR.

Note the reference *constructs* LambdaLinearScheduler for the diffusion
trainer but never steps it (exps/diffusion.py:165 — documented bug); our
trainers take a ``use_warmup`` flag so both behaviors are available.
"""

from __future__ import annotations

import numpy as np
import optax


def lambda_linear_schedule(base_lr: float, warm_up_steps: int = 10000,
                           f_start: float = 1e-6, f_max: float = 1.0,
                           f_min: float = 1.0,
                           cycle_length: int = 10_000_000_000_000):
    """ref LambdaLinearScheduler (scheduler.py:81-97): linear warmup
    f_start→f_max, then linear decay toward f_min over cycle_length."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) * step / max(warm_up_steps, 1)
        decay = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        f = jnp.where(step < warm_up_steps, warm, decay)
        return base_lr * f

    return schedule


def lambda_warmup_cosine_schedule(base_lr: float, warm_up_steps: int,
                                  lr_max: float = 1.0, lr_min: float = 0.0,
                                  lr_start: float = 0.0,
                                  cycle_length: int = 10_000_000_000_000):
    """ref LambdaWarmUpCosineScheduler (scheduler.py:4-33)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = (step - warm_up_steps) / cycle_length
        t = jnp.minimum(t, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * np.pi))
        return base_lr * jnp.where(step < warm_up_steps, warm, cos)

    return schedule
