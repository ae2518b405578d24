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


class TestDividedAttention:
    """Fused packed-qkv divided attention vs the transpose-based reference."""

    def _mk(self, b, f, n, heads, dh, seed=7, dtype=jnp.float32):
        from moditalker_tpu.ops import rotary

        rng = np.random.default_rng(seed)
        qkv = jnp.asarray(rng.normal(size=(b, f, n, 3 * heads * dh)), dtype)
        t_sin, t_cos = rotary.time_rotary_sincos(f, dh)
        side = int(round(n ** 0.5))
        if side * side == n:
            s_sin, s_cos = rotary.axial_rotary_sincos(side, side, dh)
        else:
            s_sin, s_cos = rotary.time_rotary_sincos(n, dh)
        return qkv, (t_sin, t_cos), (s_sin, s_cos)

    @pytest.mark.parametrize("axis", ["space", "time"])
    def test_fused_matches_reference(self, axis):
        from moditalker_tpu.ops.pallas.divided_attention import (
            divided_attention, divided_attention_reference)

        heads, dh = 2, 64
        qkv, tsc, ssc = self._mk(2, 16, 256, heads, dh)
        sin, cos = ssc if axis == "space" else tsc
        scale = dh**-0.5
        expected = divided_attention_reference(qkv, sin, cos, axis, heads,
                                               dh, scale)
        got = divided_attention(qkv, sin, cos, axis, heads, dh, scale,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("axis", ["space", "time"])
    def test_fused_backward_matches_reference(self, axis):
        from moditalker_tpu.ops.pallas.divided_attention import (
            divided_attention, divided_attention_reference)

        heads, dh = 2, 16
        qkv, tsc, ssc = self._mk(1, 8, 256, heads, dh, seed=9)
        sin, cos = ssc if axis == "space" else tsc
        scale = dh**-0.5

        def loss_fused(t):
            return jnp.sum(divided_attention(
                t, sin, cos, axis, heads, dh, scale, interpret=True) ** 2)

        def loss_ref(t):
            return jnp.sum(divided_attention_reference(
                t, sin, cos, axis, heads, dh, scale) ** 2)

        g_fused = jax.grad(loss_fused)(qkv)
        g_ref = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=2e-3, atol=2e-4)

    def test_nonviable_shapes_fall_back(self):
        from moditalker_tpu.ops.pallas.divided_attention import (
            divided_attention, divided_attention_reference)

        heads, dh = 2, 64
        # n=100 tiles nothing cleanly -> reference path (still correct)
        qkv, tsc, _ = self._mk(1, 16, 100, heads, dh, seed=11)
        from moditalker_tpu.ops import rotary
        sin, cos = rotary.time_rotary_sincos(100, dh)
        scale = dh**-0.5
        got = divided_attention(qkv, sin, cos, "space", heads, dh, scale)
        expected = divided_attention_reference(qkv, sin, cos, "space",
                                               heads, dh, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-6)


class TestPackedAttention:
    """Lane-masked packed-head attention vs the head-split reference."""

    @pytest.mark.parametrize("b,l,c,heads", [
        (1, 1024, 128, 8),   # UNet joint attn shape family (dh=16, viable)
        (1, 128, 256, 8),    # dh=32 -> reference fallback
        (2, 64, 128, 2),     # dh=64 -> reference fallback
    ])
    def test_matches_reference(self, b, l, c, heads):
        from moditalker_tpu.ops.pallas.packed_attention import (
            packed_attention, packed_attention_reference)

        rng = np.random.default_rng(5)
        qkv = jnp.asarray(rng.normal(size=(b, l, 3 * c)), jnp.float32)
        scale = (c // heads) ** -0.5
        expected = packed_attention_reference(qkv, heads, scale)
        got = packed_attention(qkv, heads, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-5)

    def test_backward_matches_reference(self):
        from moditalker_tpu.ops.pallas.packed_attention import (
            packed_attention, packed_attention_reference)

        rng = np.random.default_rng(6)
        qkv = jnp.asarray(rng.normal(size=(1, 1024, 3 * 128)), jnp.float32)
        scale = 16 ** -0.5

        g1 = jax.grad(lambda t: jnp.sum(
            packed_attention(t, 8, scale, interpret=True) ** 2))(qkv)
        g2 = jax.grad(lambda t: jnp.sum(
            packed_attention_reference(t, 8, scale) ** 2))(qkv)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-3, atol=2e-4)

    def test_nonviable_falls_back(self):
        from moditalker_tpu.ops.pallas.packed_attention import (
            packed_attention, packed_attention_reference)

        rng = np.random.default_rng(7)
        qkv = jnp.asarray(rng.normal(size=(1, 48, 3 * 96)), jnp.float32)
        scale = 12 ** -0.5
        got = packed_attention(qkv, 8, scale)
        expected = packed_attention_reference(qkv, 8, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-6)
