"""Pallas fused attention: numerical parity vs the XLA einsum path.

On the CPU test backend the kernel runs in interpret mode; on TPU the same
code compiles via Mosaic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moditalker_tpu.ops.attention import sdpa
from moditalker_tpu.ops.pallas.flash_attention import fused_attention


@pytest.mark.parametrize("n,d", [(128, 64), (256, 64), (2048, 64)])
def test_fused_attention_matches_sdpa(n, d):
    rng = np.random.default_rng(0)
    b = 4
    q = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    scale = d**-0.5
    expected = sdpa(q, k, v, scale=scale)
    got = fused_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_fused_attention_ragged_falls_back():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 100, 64)), jnp.float32)  # 100 % 8 != 0
    k = jnp.asarray(rng.normal(size=(2, 100, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 100, 64)), jnp.float32)
    out = fused_attention(q, k, v)
    expected = sdpa(q, k, v, scale=64**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("n,d", [(1024, 16), (2048, 16), (1024, 64)])
def test_onepass_attention_matches_sdpa(n, d):
    from moditalker_tpu.ops.pallas.flash_attention import onepass_attention

    rng = np.random.default_rng(3)
    b = 3
    q = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    scale = d**-0.5
    expected = sdpa(q, k, v, scale=scale)
    got = onepass_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("b,n,d", [(256, 16, 64), (128, 8, 16)])
def test_tiny_attention_matches_sdpa(b, n, d):
    from moditalker_tpu.ops.pallas.flash_attention import tiny_attention

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    scale = d**-0.5
    expected = sdpa(q, k, v, scale=scale)
    got = tiny_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_flash_sdpa_backward_matches_xla():
    """The custom-VJP backward (used when the TPU forward dispatches to the
    Pallas kernel) must produce the same gradients as differentiating the
    einsum path."""
    from moditalker_tpu.ops.attention import _flash_sdpa_bwd, _xla_sdpa

    rng = np.random.default_rng(4)
    b, n, d = 2, 64, 16
    scale = d**-0.5
    q = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)

    def ref(q, k, v):
        return jnp.sum(_xla_sdpa(q * scale, k, v) * g)

    dq_ref, dk_ref, dv_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    dq, dk, dv = _flash_sdpa_bwd(scale, (q, k, v), g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_attention_cross_lengths():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 64, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 512, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 512, 64)), jnp.float32)
    out = fused_attention(q, k, v, interpret=True)
    expected = sdpa(q, k, v, scale=64**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)
