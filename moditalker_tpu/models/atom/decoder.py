"""AToM MotionDecoder — FiLM-conditioned transformer diffusion denoiser.

TPU-native re-design of the reference model (``AToM/model/model.py:242-470``):

* same computation graph: 68 landmarks split into a lip stream (lower-face 17
  + lip 20 = 37 pts) and an upper-face stream (31 pts), HuBERT conditioning
  encoder with classifier-free null embeddings, FiLM time/identity
  conditioning, 8 dual-stream FiLM decoder layers, fused output head;
* full-model-dim rotary embeddings (lucidrains semantics, applied before the
  attention projections — ``model.py:85,199,213``);
* the two shared-weight self-attention calls per decoder layer (lip & face)
  are folded into ONE batched attention call (stacked on the batch axis) so
  the MXU sees a 2B batch instead of two sequential small matmuls;
* classifier-free guidance runs as a doubled batch in a single forward pass
  (see ``guided_forward``), not two sequential passes (``model.py:385-389``);
* dead reference modules (``face_mlp``, ``to_face_cond/tokens``,
  ``pos_encoder/projection``, ``input_projection``, decoder-layer ``linear1/
  linear2`` FFN — all constructed but unused on the norm_first path) are not
  reproduced.

Parameters are fp32; compute dtype is configurable (bf16 on TPU).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import AtomModelConfig
from ...ops import rotary
from ...ops.attention import multi_head_sdpa


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalPosEmb(nn.Module):
    """Diffusion-timestep embedding (ref AToM/model/utils.py:36-48)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        emb = jnp.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class DenseFiLM(nn.Module):
    """FiLM generator (ref model.py:15-27): Mish → Dense(2d) → (scale, shift)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pos):
        h = nn.Dense(self.features * 2, dtype=self.dtype, name="proj")(mish(pos))
        h = h[:, None, :]  # b c -> b 1 c
        scale, shift = jnp.split(h, 2, axis=-1)
        return scale, shift


def featurewise_affine(x, scale_shift):
    scale, shift = scale_shift
    return (scale + 1.0) * x + shift


class MHA(nn.Module):
    """Multi-head attention with torch ``nn.MultiheadAttention`` semantics:
    separate biased q/k/v projections of the given inputs + biased out proj."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, deterministic: bool = True):
        dd = dict(dtype=self.dtype)
        q = nn.Dense(self.d_model, name="q_proj", **dd)(q_in)
        k = nn.Dense(self.d_model, name="k_proj", **dd)(k_in)
        v = nn.Dense(self.d_model, name="v_proj", **dd)(v_in)
        out = multi_head_sdpa(q, k, v, self.num_heads)
        out = nn.Dense(self.d_model, name="out_proj", **dd)(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class EncoderLayer(nn.Module):
    """Pre-LN transformer encoder layer with full-dim rotary on q/k
    (ref model.py:35-99)."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        freqs = jnp.asarray(rotary.rotary_full_dim_freqs(x.shape[-2], self.d_model))
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        qk = rotary.apply_rotary_full_dim(h, freqs)
        attn = MHA(self.d_model, self.num_heads, self.dropout, self.dtype,
                   name="self_attn")(qk, qk, h, deterministic)
        x = x + attn
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.ff_size, dtype=self.dtype, name="linear1")(h)
        h = jax.nn.gelu(h, approximate=False)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class FiLMDecoderLayer(nn.Module):
    """Dual-stream (lip / upper-face) FiLM decoder layer (ref model.py:102-228,
    norm_first path of ``forward``, :161-194).

    The two same-weight self-attentions (lip & face through ``norm1`` +
    ``self_attn``) are executed as one stacked call.
    """

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, lip_t, nonlip_t, face_memory,
                 deterministic: bool = True):
        d = self.d_model
        b, t, _ = x.shape
        lip, face = x[..., :d], x[..., d:]

        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        self_attn = MHA(d, self.num_heads, self.dropout, self.dtype,
                        name="self_attn")
        cross_attn = MHA(d, self.num_heads, self.dropout, self.dtype,
                         name="multihead_attn")
        film1 = DenseFiLM(d, self.dtype, name="film1")
        film2 = DenseFiLM(d, self.dtype, name="film2")
        film3 = DenseFiLM(d, self.dtype, name="film3")

        seq_freqs = jnp.asarray(rotary.rotary_full_dim_freqs(t, d))

        def sa_block(h):
            qk = rotary.apply_rotary_full_dim(h, seq_freqs)
            return self_attn(qk, qk, h, deterministic)

        def mha_block(h, mem):
            mem_freqs = jnp.asarray(rotary.rotary_full_dim_freqs(mem.shape[-2], d))
            q = rotary.apply_rotary_full_dim(h, seq_freqs)
            k = rotary.apply_rotary_full_dim(mem, mem_freqs)
            return cross_attn(q, k, mem, deterministic)

        # --- block 1: both streams self-attend with shared weights; stack
        # them on the batch axis so one attention call covers both.
        stacked = jnp.concatenate([norm1(face), norm1(lip)], axis=0)
        sa_out = sa_block(stacked)
        face1, lip1 = sa_out[:b], sa_out[b:]
        lip = lip + featurewise_affine(lip1, film1(lip_t))
        face = face + featurewise_affine(face1, film1(nonlip_t))

        # --- block 2: face self-attends, lip cross-attends to full memory
        face2 = sa_block(norm2(face))
        lip2 = mha_block(norm2(lip), memory)
        lip = lip + featurewise_affine(lip2, film2(lip_t))
        face = face + featurewise_affine(face2, film2(nonlip_t))

        # --- fusion: cross-attend to face memory, FiLM, widen back to 2d
        x_tmp = face + lip
        x_tmp = mha_block(norm3(x_tmp), face_memory)
        t_mix = (lip_t + nonlip_t) / 2
        x_tmp = x_tmp + featurewise_affine(x_tmp, film3(t_mix))
        return nn.Dense(2 * d, dtype=self.dtype, name="linear3")(x_tmp)


class MotionDecoder(nn.Module):
    """Full AToM denoiser (ref model.py:242-470).

    Call signature: ``(x, face, cond_embed, times, keep_mask)`` where
    ``x`` [B,T,204] is the noisy landmark residual, ``face`` [B,T,204] the
    identity keypoint broadcast over the horizon, ``cond_embed`` [B,2T,1024]
    HuBERT features, ``times`` int [B], and ``keep_mask`` bool [B] selects
    conditioned (True) vs null (False) per sample (CFG dropout).
    The reference's unused ``x_pos`` pose argument is dropped.
    """

    cfg: AtomModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, face, cond_embed, times,
                 keep_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        cfg = self.cfg
        d = cfg.latent_dim
        b, t_len, _ = x.shape
        dd = dict(dtype=self.dtype)
        if keep_mask is None:
            keep_mask = jnp.ones((b,), dtype=bool)

        # ---- landmark stream split (model.py:400-417)
        pts = x.reshape(b, t_len, -1, 3)
        upper = pts[:, :, 17:48].reshape(b, t_len, -1)          # 31*3
        lower_w_lip = jnp.concatenate(
            [pts[:, :, :17].reshape(b, t_len, -1),              # 17*3
             pts[:, :, 48:].reshape(b, t_len, -1)], axis=-1)    # 20*3
        lip_h = nn.Dense(d, name="input_projection_lip", **dd)(lower_w_lip)
        upper_h = nn.Dense(d, name="input_projection_wo_lip", **dd)(upper)
        h = jnp.concatenate([lip_h, upper_h], axis=-1)          # [B,T,2d]

        keep_embed = keep_mask[:, None, None]
        keep_hidden = keep_mask[:, None]

        # ---- HuBERT conditioning tokens (model.py:425-433)
        cond_tokens = nn.Dense(d, name="cond_projection", **dd)(cond_embed)
        for i in range(2):
            cond_tokens = EncoderLayer(
                d, cfg.num_heads, cfg.ff_size, cfg.dropout, self.dtype,
                name=f"cond_encoder_{i}")(cond_tokens, deterministic)
        null_cond_embed = self.param(
            "null_cond_embed", nn.initializers.normal(1.0),
            (1, cfg.horizon * 2, d))
        cond_tokens = jnp.where(
            keep_embed, cond_tokens,
            null_cond_embed[:, : cond_tokens.shape[1]].astype(cond_tokens.dtype))

        def non_attn_proj(name, z):
            z = nn.LayerNorm(name=f"{name}_ln", **dd)(z)
            z = nn.Dense(d, name=f"{name}_fc1", **dd)(z)
            z = jax.nn.silu(z)
            return nn.Dense(d, name=f"{name}_fc2", **dd)(z)

        cond_hidden = non_attn_proj(
            "non_attn_cond_projection", cond_tokens.mean(axis=-2))

        # ---- diffusion timestep embedding (model.py:268-281, 436-442)
        t_hidden = SinusoidalPosEmb(d, name="time_sinu")(times)
        t_hidden = mish(nn.Dense(d * 4, name="time_mlp", **dd)(t_hidden))
        t_cond = nn.Dense(d, name="to_time_cond", **dd)(t_hidden)
        t_tokens = nn.Dense(d * 2, name="to_time_tokens", **dd)(t_hidden)
        t_tokens = t_tokens.reshape(b, 2, d)

        # ---- identity keypoint tokens (model.py:444-455)
        face_tokens = nn.Dense(d, name="face_projection", **dd)(face)
        for i in range(2):
            face_tokens = EncoderLayer(
                d, cfg.num_heads, cfg.ff_size, cfg.dropout, self.dtype,
                name=f"face_encoder_{i}")(face_tokens, deterministic)
        face_null = self.param(
            "face_null_cond_embed", nn.initializers.normal(1.0),
            (1, cfg.horizon, d))
        face_tokens = jnp.where(
            keep_embed, face_tokens,
            face_null[:, : face_tokens.shape[1]].astype(face_tokens.dtype))
        face_hidden = non_attn_proj(
            "non_attn_face_projection", face_tokens.mean(axis=-2))

        # ---- null hidden + stream conditioning (model.py:441-460)
        # NOTE: the reference aliases lip_t and nonlip_t to the SAME tensor
        # and updates it with in-place `+=` three times, so both streams
        # effectively receive t + 2*face_hidden + cond_hidden. We reproduce
        # that exact (buggy-looking but trained-in) semantics.
        null_cond_hidden = self.param(
            "null_cond_hidden", nn.initializers.normal(1.0), (1, d))
        cond_hidden = jnp.where(
            keep_hidden, cond_hidden, null_cond_hidden.astype(cond_hidden.dtype))
        stream_t = t_cond + 2.0 * face_hidden + cond_hidden
        lip_t = nonlip_t = stream_t

        norm_cond = nn.LayerNorm(name="norm_cond", **dd)
        memory = norm_cond(
            jnp.concatenate([cond_tokens, t_tokens, face_tokens], axis=-2))
        face_memory = norm_cond(
            jnp.concatenate([t_tokens, face_tokens], axis=-2))

        # ---- decoder stack + head (model.py:468-470)
        for i in range(cfg.num_layers):
            h = FiLMDecoderLayer(
                d, cfg.num_heads, cfg.ff_size, cfg.dropout, self.dtype,
                name=f"decoder_{i}")(
                    h, memory, lip_t, nonlip_t, face_memory, deterministic)
        return nn.Dense(cfg.repr_dim, name="final_layer", **dd)(h)


def guided_forward(model: MotionDecoder, params, x, face, cond_embed, times,
                   guidance_weight):
    """Classifier-free guidance as ONE doubled-batch forward
    (vs two sequential passes in ref model.py:385-389)."""
    b = x.shape[0]
    x2 = jnp.concatenate([x, x], axis=0)
    face2 = jnp.concatenate([face, face], axis=0)
    cond2 = jnp.concatenate([cond_embed, cond_embed], axis=0)
    times2 = jnp.concatenate([times, times], axis=0)
    keep = jnp.concatenate(
        [jnp.zeros((b,), bool), jnp.ones((b,), bool)], axis=0)
    out = model.apply(params, x2, face2, cond2, times2, keep_mask=keep,
                      deterministic=True)
    unc, cond = out[:b], out[b:]
    return unc + (cond - unc) * guidance_weight
