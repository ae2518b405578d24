"""Tensor-parallel primitive tests on the (2, 4) virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from moditalker_tpu.parallel import (column_parallel_dense,
                                     head_parallel_attention, make_2d_mesh,
                                     row_parallel_dense)
from moditalker_tpu.ops.attention import multi_head_sdpa


def test_column_then_row_matches_dense():
    mesh = make_2d_mesh(2, 4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)

    col = column_parallel_dense(mesh)
    row = row_parallel_dense(mesh)
    h = col(x, w1, b1)
    y = row(h, w2, b2)
    expected = (x @ w1 + b1) @ w2 + b2
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_head_parallel_attention_matches_single_device():
    mesh = make_2d_mesh(2, 4)
    rng = np.random.default_rng(1)
    b, n, h, d = 4, 16, 8, 8
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)

    tp_attn = head_parallel_attention(mesh, h)
    got = tp_attn(q, k, v)

    expected = multi_head_sdpa(
        q.reshape(b, n, h * d), k.reshape(b, n, h * d),
        v.reshape(b, n, h * d), num_heads=h).reshape(b, n, h, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)
