"""Triplane latent-diffusion UNet.

Re-implements ``MToV/models/ddpm/unet.py:601-1117`` TPU-first:

* every UNet stage runs ONE shared-weight 2D block per plane; the reference
  issues three sequential same-weight calls (xy, yt, xt — unet.py:1031-1034).
  Here yt and xt (identical [s, r] shapes) are STACKED on the batch axis so
  each stage is two conv calls (one [B, r, r], one [2B, s, r]) — bigger
  batches onto the MXU, fewer dispatches;
* after each stage, the three planes' tokens are re-concatenated and a joint
  1D self-attention runs over all r² + 2·s·r tokens (unet.py:1039-1049);
* channels-last layout (NHWC) for all convs; GroupNorm computed in fp32
  (reference GroupNorm32, diffusionmodules.py:171); softmax fp32;
* the zeros-padding of ``image_cond`` beyond the xy plane (unet.py:1022-1024,
  which hardcodes a "cuda" literal) becomes a plain jnp.zeros concat;
* the dead ``output_bg_blocks``/``output_bg_attns`` branch (unet.py:859-861,
  built but never called in forward) is not reproduced.

Latent layout matches the reference byte-for-byte:
[B, C, r*r + s*r + s*r] with planes xy | yt | xt.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import MtovUNetConfig
from ...ops.pallas.packed_attention import packed_attention


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """cos-then-sin sinusoid (ref diffusionmodules.py:108-128)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def group_norm_32(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over the channel (last) axis, computed in fp32 regardless of
    the activation dtype (ref GroupNorm32).

    Layout note: reductions run over the spatial axes FIRST ([B,...,C] →
    [B,C], a lane-preserving reduction the VPU does at bandwidth), and the
    per-group fold happens on the tiny [B,C] result. Reshaping the full
    tensor to [..., g, c/g] up front (the obvious translation) splits the
    lane dimension and measured 353 us for a 2 MB block on v5e — ~10× the
    bandwidth cost of the op.

    Variance is a SHIFTED one-pass form in fp32: sums of (x−k) and (x−k)²
    with k = the first spatial element per (batch, channel) — still ONE
    pass over the tensor in this bandwidth-bound model (the subtract rides
    the existing read; XLA fuses it into the reduction), but unlike the
    plain E[x²]−E[x]² form it does not cancel when |mean| ≫ std: x−k is
    O(std) by construction. Measured at [4,2048,512] with mean 500× the
    std, plain one-pass lost 0.24 of a std vs the fp64 two-pass reference;
    shifted one-pass is at 3e-6 (tests/test_mtov_parity.py
    ::test_group_norm_one_pass_variance_at_production_scales).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    c = x32.shape[-1]
    g = num_groups
    b = x32.shape[0]
    spatial = tuple(range(1, x32.ndim - 1))
    n = 1
    for a in spatial:
        n *= x32.shape[a]
    n *= c // g
    n_sp = n // (c // g)                               # spatial element count
    k = x32[(slice(None),) + (0,) * len(spatial)]      # [B, C] sample shift
    kb = k.reshape((b,) + (1,) * len(spatial) + (c,))
    y = x32 - kb                                       # O(std) by construction
    s1 = jnp.sum(y, axis=spatial)                      # [B, C]
    s2 = jnp.sum(y * y, axis=spatial)                  # [B, C]
    # Var_G(x) with x = y + k_c decomposes as Var_G(y) + 2·Cov_c(ȳ_c, k_c)
    # + Var_c(k_c); every term is O(std²) — no large-number cancellation.
    # The k-side moments are two-pass, but only over the tiny [B, C] k.
    m_y = s1 / n_sp                                    # [B, C] E_sp[y_c]
    ey = m_y.reshape(b, g, c // g).mean(-1)            # [B, g]
    ek = k.reshape(b, g, c // g).mean(-1)              # [B, g]
    mean = ey + ek
    var_y = s2.reshape(b, g, c // g).sum(-1) / n - ey * ey
    kc = k.reshape(b, g, c // g) - ek[..., None]       # centered shifts
    var_k = (kc * kc).mean(-1)
    cov = (m_y.reshape(b, g, c // g) * kc).mean(-1)
    var = jnp.maximum(var_y + 2.0 * cov + var_k, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    shape = (b,) + (1,) * len(spatial) + (c,)
    mean_c = jnp.repeat(mean, c // g, -1).reshape(shape)
    inv_c = jnp.repeat(inv, c // g, -1).reshape(shape)
    out = (x32 - mean_c) * inv_c
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


class GroupNorm32(nn.Module):
    channels: int
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return group_norm_32(x, scale, bias, self.num_groups)


def _avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _nearest_up2(x):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class ResBlock(nn.Module):
    """Scale-shift GroupNorm residual block, optionally resampling
    (ref unet.py:93-207)."""

    channels: int
    out_channels: int
    emb_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = GroupNorm32(self.channels, name="in_norm")(x)
        h = jax.nn.silu(h)
        if self.down:
            h = _avg_pool2(h)
            x = _avg_pool2(x)
        elif self.up:
            h = _nearest_up2(h)
            x = _nearest_up2(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels,
            dtype=self.dtype, name="emb_proj")(jax.nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(self.out_channels, name="out_norm")(h)
            h = h * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNorm32(self.out_channels, name="out_norm")(h)
        h = jax.nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if self.out_channels == self.channels:
            skip = x
        else:
            skip = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="skip")(x)
        return skip + h


class SelfAttentionBlock(nn.Module):
    """Token self-attention with zero-init output projection — used both for
    per-plane spatial attention (ref AttentionBlock, unet.py:210-254) and the
    joint triplane 1D attention (AttentionBlock1D, :257-300). Input [B, L, C].
    """

    channels: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        h = GroupNorm32(self.channels, name="norm")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        dh = c // self.num_heads
        # lane-masked packed-head kernel on TPU (no head-split transposes,
        # full-width contractions — crucial at this model's dh=16);
        # head-split XLA path elsewhere (ops/pallas/packed_attention.py)
        out = packed_attention(qkv, self.num_heads, scale=dh**-0.5)
        out = nn.Dense(c, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="proj_out")(out)
        return x + out


class TriplaneUNet(nn.Module):
    """Set ``remat=True`` to rematerialize each UNet stage (the reference
    force-checkpoints its attention blocks — unet.py:245,292; on TPU
    ``jax.checkpoint`` trades HBM for recompute, useful for the 256-channel
    longvid config)."""

    cfg: MtovUNetConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.cfg
        mc = cfg.model_channels
        emb_ch = mc * 4
        Res, Attn = ResBlock, SelfAttentionBlock
        if self.remat:
            # the deterministic flag must stay static under remat
            Res = nn.remat(ResBlock, static_argnums=(2,))
            Attn = nn.remat(SelfAttentionBlock)
        self.time_embed_1 = nn.Dense(emb_ch, dtype=self.dtype)
        self.time_embed_2 = nn.Dense(emb_ch, dtype=self.dtype)
        self.input_conv = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype)

        dd = dict(emb_channels=emb_ch, dropout=cfg.dropout,
                  use_scale_shift_norm=cfg.use_scale_shift_norm,
                  dtype=self.dtype)

        in_res: list = []
        in_attn2d: list = []
        in_joint: list = [None]  # initial conv has no joint attention module
        chans = [mc]
        ch = mc
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                in_res.append(Res(channels=ch, out_channels=mult * mc, **dd))
                ch = mult * mc
                in_attn2d.append(
                    Attn(ch, cfg.num_heads, dtype=self.dtype)
                    if ds in cfg.attention_resolutions else None)
                in_joint.append(
                    Attn(ch, cfg.num_heads, dtype=self.dtype))
                chans.append(ch)
            if level != len(cfg.channel_mult) - 1:
                in_res.append(Res(channels=ch, out_channels=ch, down=True,
                                       **dd))
                in_attn2d.append(None)
                in_joint.append(
                    Attn(ch, cfg.num_heads, dtype=self.dtype))
                chans.append(ch)
                ds *= 2
        self.in_res = in_res
        self.in_attn2d = in_attn2d
        self.in_joint = in_joint
        self._input_chans = chans
        self._mid_ds = ds

        self.mid_res1 = Res(channels=ch, out_channels=ch, **dd)
        self.mid_attn2d = Attn(ch, cfg.num_heads, dtype=self.dtype)
        self.mid_res2 = Res(channels=ch, out_channels=ch, **dd)
        self.mid_joint = Attn(ch, cfg.num_heads, dtype=self.dtype)

        out_res: list = []
        out_attn2d: list = []
        out_up: list = []
        out_joint: list = []
        chans_pop = list(chans)
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                ich = chans_pop.pop()
                out_res.append(
                    Res(channels=ch + ich, out_channels=mult * mc, **dd))
                ch = mult * mc
                out_attn2d.append(
                    Attn(ch, cfg.num_heads, dtype=self.dtype)
                    if ds in cfg.attention_resolutions else None)
                if level and i == cfg.num_res_blocks:
                    out_up.append(Res(channels=ch, out_channels=ch,
                                           up=True, **dd))
                    ds //= 2
                else:
                    out_up.append(None)
                out_joint.append(
                    Attn(ch, cfg.num_heads, dtype=self.dtype))
        self.out_res = out_res
        self.out_attn2d = out_attn2d
        self.out_up = out_up
        self.out_joint = out_joint

        self.out_norm = GroupNorm32(ch)
        self.out_conv = nn.Conv(cfg.out_channels, (3, 3), padding=1,
                                dtype=self.dtype,
                                kernel_init=nn.initializers.zeros)

    # ---------------------------------------------------------------- helpers
    def _flatten(self, p):
        b, h, w, c = p.shape
        return p.reshape(b, h * w, c)

    def _joint(self, attn, h_xy, h_ytxt):
        """Concat plane tokens (xy | yt | xt), run joint attention, split back
        (ref unet.py:1039-1049)."""
        b = h_xy.shape[0]
        r_h, r_w = h_xy.shape[1], h_xy.shape[2]
        t_h, t_w = h_ytxt.shape[1], h_ytxt.shape[2]
        xy_tok = self._flatten(h_xy)
        yt_tok = self._flatten(h_ytxt[:b])
        xt_tok = self._flatten(h_ytxt[b:])
        tokens = jnp.concatenate([xy_tok, yt_tok, xt_tok], axis=1)
        tokens = attn(tokens)
        n_xy = r_h * r_w
        n_p = t_h * t_w
        h_xy = tokens[:, :n_xy].reshape(b, r_h, r_w, -1)
        h_yt = tokens[:, n_xy : n_xy + n_p].reshape(b, t_h, t_w, -1)
        h_xt = tokens[:, n_xy + n_p :].reshape(b, t_h, t_w, -1)
        return h_xy, jnp.concatenate([h_yt, h_xt], axis=0)

    def _attn2d(self, attn, p):
        b, h, w, c = p.shape
        return attn(p.reshape(b, h * w, c)).reshape(b, h, w, c)

    def _maybe_remat(self, fn):
        if not self.remat:
            return fn
        return nn.remat(fn) if isinstance(fn, nn.Module) else jax.checkpoint(fn)

    # ---------------------------------------------------------------- forward
    def __call__(self, x, cond, image_cond, t, deterministic: bool = True):
        """x [B,Cin,L], cond [B,Cc,L], image_cond [B,Cin,L] → [B,Cout,L]
        with L = r² + 2·s·r (ref unet.py:995-1117)."""
        cfg = self.cfg
        b = x.shape[0]
        r, s = cfg.latent_res, cfg.latent_t
        n_xy = r * r

        emb = timestep_embedding(t, cfg.model_channels)
        emb = self.time_embed_2(jax.nn.silu(self.time_embed_1(emb)))
        emb2 = jnp.concatenate([emb, emb], axis=0)  # for the stacked yt|xt

        # image_cond: keep only the xy plane, zero the rest (unet.py:1022-1024)
        ic = jnp.concatenate(
            [image_cond[:, :, :n_xy],
             jnp.zeros((b, image_cond.shape[1], 2 * s * r), x.dtype)], axis=-1)
        h = jnp.concatenate([x, cond, ic], axis=1)  # [B, 16, L]

        def to_plane(tok, t_h, t_w):
            return tok.reshape(b, -1, t_h, t_w).transpose(0, 2, 3, 1)

        h_xy = to_plane(h[:, :, :n_xy], r, r)
        h_yt = to_plane(h[:, :, n_xy : n_xy + s * r], s, r)
        h_xt = to_plane(h[:, :, n_xy + s * r :], s, r)
        h_ytxt = jnp.concatenate([h_yt, h_xt], axis=0)  # [2B, s, r, C]

        det = deterministic
        skips: list = []

        # input conv stage (joint attention skipped — reference Identity)
        h_xy = self.input_conv(h_xy)
        h_ytxt = self.input_conv(h_ytxt)
        skips.append((h_xy, h_ytxt))

        i_joint = 1
        for res, attn2d in zip(self.in_res, self.in_attn2d):
            h_xy = res(h_xy, emb, det)
            h_ytxt = res(h_ytxt, emb2, det)
            if attn2d is not None:
                h_xy = self._attn2d(attn2d, h_xy)
                h_ytxt = self._attn2d(attn2d, h_ytxt)
            h_xy, h_ytxt = self._joint(self.in_joint[i_joint], h_xy, h_ytxt)
            i_joint += 1
            skips.append((h_xy, h_ytxt))

        # middle
        h_xy = self.mid_res1(h_xy, emb, det)
        h_ytxt = self.mid_res1(h_ytxt, emb2, det)
        h_xy = self._attn2d(self.mid_attn2d, h_xy)
        h_ytxt = self._attn2d(self.mid_attn2d, h_ytxt)
        h_xy = self.mid_res2(h_xy, emb, det)
        h_ytxt = self.mid_res2(h_ytxt, emb2, det)
        h_xy, h_ytxt = self._joint(self.mid_joint, h_xy, h_ytxt)

        # up path
        for res, attn2d, up, joint in zip(
                self.out_res, self.out_attn2d, self.out_up, self.out_joint):
            skip_xy, skip_ytxt = skips.pop()
            h_xy = res(jnp.concatenate([h_xy, skip_xy], axis=-1), emb, det)
            h_ytxt = res(jnp.concatenate([h_ytxt, skip_ytxt], axis=-1),
                         emb2, det)
            if attn2d is not None:
                h_xy = self._attn2d(attn2d, h_xy)
                h_ytxt = self._attn2d(attn2d, h_ytxt)
            if up is not None:
                h_xy = up(h_xy, emb, det)
                h_ytxt = up(h_ytxt, emb2, det)
            h_xy, h_ytxt = self._joint(joint, h_xy, h_ytxt)

        # output head per plane, then repack to the reference latent layout
        def head(p):
            p = jax.nn.silu(self.out_norm(p))
            return self.out_conv(p)

        o_xy = head(h_xy)
        o_ytxt = head(h_ytxt)
        f_xy = o_xy.transpose(0, 3, 1, 2).reshape(b, cfg.out_channels, -1)
        o_yt, o_xt = o_ytxt[:b], o_ytxt[b:]
        f_yt = o_yt.transpose(0, 3, 1, 2).reshape(b, cfg.out_channels, -1)
        f_xt = o_xt.transpose(0, 3, 1, 2).reshape(b, cfg.out_channels, -1)
        return jnp.concatenate([f_xy, f_yt, f_xt], axis=-1).astype(x.dtype)
