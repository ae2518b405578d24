"""HuBERT speech encoder in flax — the TPU-native audio feature path.

Re-implements the inference path of transformers' ``HubertModel`` for the
``facebook/hubert-large-ls960-ft`` configuration family (the model the
reference invokes via torch, ``process_audio.py:14-16``): 7-layer conv
feature extractor (layer-norm variant), feature projection, grouped
weight-normalized convolutional positional embedding, and a
stable-layer-norm transformer encoder. Weights port from the torch
state_dict via ``convert_hubert``; parity is tested against a
randomly-initialized torch ``HubertModel`` in ``tests/test_hubert.py``.

Combine with ``preprocess.audio.extract_hubert_features`` (chunking) and
``normalize_like_wav2vec2`` for the full reference-equivalent pipeline, with
the encoder jitted on TPU instead of torch on GPU.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_sdpa


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5


class FeatureExtractor(nn.Module):
    """Strided Conv1D stack, layer-norm variant (HF HubertFeatureEncoder)."""

    cfg: HubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, N] raw waveform
        h = x[:, :, None]  # [B, N, 1]
        for i, (dim, k, s) in enumerate(zip(
                self.cfg.conv_dim, self.cfg.conv_kernel,
                self.cfg.conv_stride)):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=self.cfg.conv_bias, dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps,
                             dtype=self.dtype, name=f"ln_{i}")(h)
            h = jax.nn.gelu(h, approximate=False)
        return h  # [B, T, conv_dim[-1]]


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (weight norm folded at convert)."""

    cfg: HubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        k = self.cfg.num_conv_pos_embeddings
        pad = k // 2
        h = nn.Conv(self.cfg.hidden_size, (k,), padding=pad,
                    feature_group_count=self.cfg.num_conv_pos_embedding_groups,
                    dtype=self.dtype, name="conv")(x)
        if k % 2 == 0:
            h = h[:, :-1]  # HF removes the extra right sample
        return jax.nn.gelu(h, approximate=False)


class EncoderLayerStableLN(nn.Module):
    cfg: HubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="attn_ln")(x)
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(h)
        kk = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(h)
        attn = multi_head_sdpa(q, kk, v, c.num_heads, mask=mask)
        x = x + nn.Dense(c.hidden_size, dtype=self.dtype,
                         name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="final_ln")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="ff1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="ff2")(h)
        return x + h


class HubertEncoder(nn.Module):
    """Full model: waveform [B, N] → features [B, T, hidden]."""

    cfg: HubertConfig = HubertConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wave, n_frames=None):
        """``n_frames`` [B] (optional): number of VALID output frames when
        ``wave`` is zero-padded to a static bucket length. Valid-frame
        outputs are exactly those of the unpadded forward: the VALID-conv
        feature windows of valid frames never cover padding, padded frames
        are zeroed before the positional conv (whose SAME padding already
        contributes zeros past the true end), and attention masks padded
        keys. One compiled program then serves every utterance length
        (serving otherwise recompiles this 24-layer model per distinct
        tail-chunk length, 20-40 s over the device tunnel)."""
        c = self.cfg
        feats = FeatureExtractor(c, self.dtype, name="feature_extractor")(wave)
        mask = None
        if n_frames is not None:
            t = feats.shape[1]
            valid = (jnp.arange(t)[None, :]
                     < jnp.asarray(n_frames)[:, None])        # [B, T]
            feats = jnp.where(valid[..., None], feats, 0.0)
            mask = valid[:, None, None, :]                    # [B,1,1,T]
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="fp_ln")(feats)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fp_proj")(h)
        if n_frames is not None:
            # fp_ln/fp_proj give padded rows a constant bias value; zero
            # them so pos_conv sees exactly the zeros SAME-padding implies
            h = jnp.where(mask[:, 0, 0, :, None], h, 0.0)
        h = h + PositionalConvEmbedding(c, self.dtype, name="pos_conv")(h)
        for i in range(c.num_layers):
            h = EncoderLayerStableLN(c, self.dtype, name=f"layer_{i}")(
                h, mask)
        # stable-layer-norm variant applies the encoder LN at the END
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="encoder_ln")(h)


def convert_hubert(sd: dict, cfg: HubertConfig) -> dict:
    """torch HubertModel state_dict → flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: dict = {"feature_extractor": {}, "pos_conv": {}}
    for i in range(len(cfg.conv_dim)):
        pre = f"feature_extractor.conv_layers.{i}"
        conv = {"kernel": np.ascontiguousarray(
            sd[f"{pre}.conv.weight"].transpose(2, 1, 0))}  # [O,I,k]->[k,I,O]
        if f"{pre}.conv.bias" in sd:
            conv["bias"] = sd[f"{pre}.conv.bias"]
        p["feature_extractor"][f"conv_{i}"] = conv
        p["feature_extractor"][f"ln_{i}"] = {
            "scale": sd[f"{pre}.layer_norm.weight"],
            "bias": sd[f"{pre}.layer_norm.bias"]}
    p["fp_ln"] = {"scale": sd["feature_projection.layer_norm.weight"],
                  "bias": sd["feature_projection.layer_norm.bias"]}
    p["fp_proj"] = {
        "kernel": np.ascontiguousarray(
            sd["feature_projection.projection.weight"].T),
        "bias": sd["feature_projection.projection.bias"]}

    # weight-normed positional conv: fold g * v / ||v|| (norm over (O, I))
    g = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
    v = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = g * v / norm  # [O, I/g, k]
    p["pos_conv"]["conv"] = {
        "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
        "bias": sd["encoder.pos_conv_embed.conv.bias"]}

    p["encoder_ln"] = {"scale": sd["encoder.layer_norm.weight"],
                       "bias": sd["encoder.layer_norm.bias"]}
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        lin = lambda n: {"kernel": np.ascontiguousarray(
            sd[f"{pre}.{n}.weight"].T), "bias": sd[f"{pre}.{n}.bias"]}
        p[f"layer_{i}"] = {
            "attn_ln": {"scale": sd[f"{pre}.layer_norm.weight"],
                        "bias": sd[f"{pre}.layer_norm.bias"]},
            "q_proj": lin("attention.q_proj"),
            "k_proj": lin("attention.k_proj"),
            "v_proj": lin("attention.v_proj"),
            "out_proj": lin("attention.out_proj"),
            "final_ln": {"scale": sd[f"{pre}.final_layer_norm.weight"],
                         "bias": sd[f"{pre}.final_layer_norm.bias"]},
            "ff1": lin("feed_forward.intermediate_dense"),
            "ff2": lin("feed_forward.output_dense"),
        }
    return {"params": p}
