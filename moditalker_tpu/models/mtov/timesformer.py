"""TimeSformer encoder/decoder — divided space-time attention.

TPU-native re-design of ``MToV/models/autoencoder/vit_modules.py:164-303``:
instead of einops-string rearranges through a flat [B, F·N, D] token list,
tokens live as [B, F, N, D] and the time/space attentions are axis
transposes — XLA sees clean batched matmuls with static shapes. Rotary
embeddings: 1D rotary over frames, axial 2D rotary over the patch grid
(per head-dim, applied to q/k).

Parity: computation graph identical to the reference (verified by ported
weights in tests/test_mtov_parity.py); softmax runs in fp32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import rotary
from ...ops.pallas.divided_attention import divided_attention


class GEGLUFeedForward(nn.Module):
    """Linear(d→8d) → GEGLU → Linear(4d→d) (ref vit_modules.py:89-105)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype, name="fc1")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class DividedAttention(nn.Module):
    """One attention over a chosen axis of [B, F, N, D] tokens
    (ref vit_modules.py:120-160). ``axis``: 'time' attends over F per patch,
    'space' attends over N per frame."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, axis: str, sin, cos):
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        # Fused Pallas path on TPU (head split + axis selection + rotary all
        # happen on VMEM blocks; no 5D transposes); exact-semantics
        # reference path elsewhere — see ops/pallas/divided_attention.py.
        out = divided_attention(qkv, sin, cos, axis, self.heads,
                                self.dim_head, self.dim_head**-0.5)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class TimeSformerBlock(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, frame_sincos, image_sincos):
        x = x + DividedAttention(
            self.dim, self.heads, self.dim_head, self.dtype, name="time_attn")(
                nn.LayerNorm(dtype=self.dtype, name="time_norm")(x),
                "time", *frame_sincos)
        x = x + DividedAttention(
            self.dim, self.heads, self.dim_head, self.dtype, name="space_attn")(
                nn.LayerNorm(dtype=self.dtype, name="space_norm")(x),
                "space", *image_sincos)
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="ff_norm")(x))
        return x


class TimeSformerEncoder(nn.Module):
    """Patchify + depth×(time-attn, space-attn, GEGLU FF)
    (ref vit_modules.py:164-236). Input [B, F, H, W, 3] → [B, F, N, D]."""

    dim: int = 384
    patch_size: int = 8
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video):
        b, f, h, w, c = video.shape
        p = self.patch_size
        hp, wp = h // p, w // p
        # 'b f (h p1) (w p2) c -> b f (h w) (p1 p2 c)'
        x = video.reshape(b, f, hp, p, wp, p, c)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, f, hp * wp, p * p * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="to_patch_embedding")(x)

        frame_sincos = rotary.time_rotary_sincos(f, self.dim_head)
        image_sincos = rotary.axial_rotary_sincos(hp, wp, self.dim_head)
        for i in range(self.depth):
            x = TimeSformerBlock(
                self.dim, self.heads, self.dim_head, self.dtype,
                name=f"block_{i}")(x, frame_sincos, image_sincos)
        return x  # [B, F, N, D]


class TimeSformerDecoder(nn.Module):
    """Same trunk, no patchify (ref vit_modules.py:238-303).
    Input [B, F, HP, WP, D] → [B, F, HP*WP, D]."""

    dim: int = 384
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        b, f, hp, wp, d = z.shape
        x = z.reshape(b, f, hp * wp, d)
        frame_sincos = rotary.time_rotary_sincos(f, self.dim_head)
        image_sincos = rotary.axial_rotary_sincos(hp, wp, self.dim_head)
        for i in range(self.depth):
            x = TimeSformerBlock(
                self.dim, self.heads, self.dim_head, self.dtype,
                name=f"block_{i}")(x, frame_sincos, image_sincos)
        return x
