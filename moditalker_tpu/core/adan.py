"""Adan optimizer as an optax GradientTransformation.

Matches the reference's vendored implementation (``AToM/model/adan.py:33-123``)
exactly, including its (beta1, beta2, beta3) = fraction-of-new convention
(defaults (0.02, 0.08, 0.01)) and its decoupled-decay-by-division
``param / (1 + wd * lr)`` step.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: chex.Array  # int32 scalar
    m: optax.Updates
    v: optax.Updates
    n: optax.Updates
    prev_grad: optax.Updates


def adan(
    learning_rate: float = 1e-3,
    b1: float = 0.02,
    b2: float = 0.08,
    b3: float = 0.01,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdanState(
            count=jnp.zeros([], jnp.int32),
            m=zeros,
            v=jax.tree_util.tree_map(jnp.zeros_like, params),
            n=jax.tree_util.tree_map(jnp.zeros_like, params),
            prev_grad=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adan requires params")
        count = state.count
        first = count == 0

        # moment updates are skipped on the very first step (ref adan.py:71-84)
        def upd_m(m, g):
            return jnp.where(first, m, m * (1 - b1) + g * b1)

        def upd_v(v, g, pg):
            return jnp.where(first, v, v * (1 - b2) + (g - pg) * b2)

        def upd_n(n, g, pg):
            nxt = (g + (1 - b2) * (g - pg)) ** 2
            return jnp.where(first, n, n * (1 - b3) + nxt * b3)

        m = jax.tree_util.tree_map(upd_m, state.m, grads)
        v = jax.tree_util.tree_map(upd_v, state.v, grads, state.prev_grad)
        n = jax.tree_util.tree_map(upd_n, state.n, grads, state.prev_grad)

        step = count + 1
        stepf = step.astype(jnp.float32)
        correct_m = 1.0 / (1.0 - (1.0 - b1) ** stepf)
        correct_v = 1.0 / (1.0 - (1.0 - b2) ** stepf)
        correct_n = 1.0 / (1.0 - (1.0 - b3) ** stepf)

        denom = 1.0 + weight_decay * learning_rate

        def delta(p, m_, v_, n_):
            weighted_step = learning_rate / (jnp.sqrt(n_ * correct_n) + eps)
            new_p = (
                p - weighted_step * (m_ * correct_m + (1 - b2) * v_ * correct_v)
            ) / denom
            return new_p - p

        updates = jax.tree_util.tree_map(delta, params, m, v, n)
        new_state = AdanState(count=step, m=m, v=v, n=n, prev_grad=grads)
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
