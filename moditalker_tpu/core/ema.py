"""Exponential moving average of parameter pytrees.

Replaces the reference's two EMA implementations (``MToV/models/ema.py``
name-mapped shadow buffers; ``AToM/model/diffusion.py:24-37`` param-zip
average) with one pure pytree op that runs inside the jitted train step —
no host-side parameter walking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay):
    """ema <- decay * ema + (1 - decay) * params (pure, jit-safe)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )


def warmup_decay(num_updates, decay: float = 0.9999):
    """Warmup-aware decay ``min(decay, (1+n)/(10+n))`` (ref MToV/models/ema.py:30)."""
    n = jnp.asarray(num_updates, dtype=jnp.float32)
    return jnp.minimum(jnp.asarray(decay, jnp.float32), (1.0 + n) / (10.0 + n))


def ema_update_every(ema_params, params, decay, step, every: int = 1):
    """Apply EMA only when ``step % every == 0`` (ref trainer.py:111 does it
    host-side every 25 iters; here it is a select inside the step)."""
    do = (step % every) == 0
    new = ema_update(ema_params, params, decay)
    return jax.tree_util.tree_map(
        lambda n, e: jnp.where(do, n, e), new, ema_params
    )
