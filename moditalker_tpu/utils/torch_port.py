"""Torch-checkpoint → flax parameter-tree converters.

The reference ecosystem ships torch ``state_dict`` checkpoints (AToM
``train-*.pt`` with {ema,model,optimizer}, MToV raw state_dicts —
``README.md:100-106``, ``AToM/AToM.py:188-196``). These converters map them
onto this framework's parameter trees so existing checkpoints keep working.
They accept plain ``{name: np.ndarray}`` dicts, so tests can also feed
freshly-initialised reference modules through them as numerical oracles.

Conventions: torch ``Linear.weight`` is [out,in] → flax ``kernel`` [in,out];
torch ``Conv2d.weight`` [O,I,kh,kw] → flax [kh,kw,I,O]; LayerNorm/GroupNorm
weight/bias → scale/bias; ``nn.MultiheadAttention.in_proj_weight`` splits into
q/k/v thirds.
"""

from __future__ import annotations

import numpy as np


def _lin(sd: dict, name: str) -> dict:
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _lin_nobias(sd: dict, name: str) -> dict:
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}


def _ln(sd: dict, name: str) -> dict:
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _gn(sd: dict, name: str) -> dict:
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _conv(sd: dict, name: str) -> dict:
    w = np.asarray(sd[f"{name}.weight"])  # [O, I, *k]
    axes = list(range(w.ndim))
    # [O, I, k...] -> [k..., I, O]
    w = w.transpose(axes[2:] + [1, 0])
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _mha(sd: dict, name: str, d: int) -> dict:
    """torch nn.MultiheadAttention -> our MHA module (q/k/v/out projections)."""
    w = np.asarray(sd[f"{name}.in_proj_weight"])
    b = np.asarray(sd[f"{name}.in_proj_bias"])
    return {
        "q_proj": {"kernel": np.ascontiguousarray(w[:d].T), "bias": b[:d]},
        "k_proj": {"kernel": np.ascontiguousarray(w[d:2*d].T), "bias": b[d:2*d]},
        "v_proj": {"kernel": np.ascontiguousarray(w[2*d:].T), "bias": b[2*d:]},
        "out_proj": _lin(sd, f"{name}.out_proj"),
    }


def _encoder_layer(sd: dict, prefix: str, d: int) -> dict:
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "self_attn": _mha(sd, f"{prefix}.self_attn", d),
        "linear1": _lin(sd, f"{prefix}.linear1"),
        "linear2": _lin(sd, f"{prefix}.linear2"),
    }


def _film(sd: dict, prefix: str) -> dict:
    # DenseFiLM.block = Sequential(Mish, Linear) -> block.1
    return {"proj": _lin(sd, f"{prefix}.block.1")}


def _decoder_layer(sd: dict, prefix: str, d: int) -> dict:
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
        "self_attn": _mha(sd, f"{prefix}.self_attn", d),
        "multihead_attn": _mha(sd, f"{prefix}.multihead_attn", d),
        "film1": _film(sd, f"{prefix}.film1"),
        "film2": _film(sd, f"{prefix}.film2"),
        "film3": _film(sd, f"{prefix}.film3"),
        "linear3": _lin(sd, f"{prefix}.linear3"),
    }


def _conv1x1_as_dense(sd: dict, name: str) -> dict:
    """Conv2d/Conv1d with 1×1 kernel → Dense."""
    w = np.asarray(sd[f"{name}.weight"])  # [O, I, 1(,1)]
    w = w.reshape(w.shape[0], w.shape[1])
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _qkv_headmajor_to_qkvmajor(sd: dict, name: str, num_heads: int) -> dict:
    """UNet attention qkv conv1d: the reference's QKVAttentionLegacy
    interprets the 3C output channels as H blocks of (q|k|v)·dh
    (unet.py:318-326); our Dense emits q(all heads) | k | v. Permute rows."""
    w = np.asarray(sd[f"{name}.weight"])[:, :, 0]  # [3C, C]
    b = np.asarray(sd[f"{name}.bias"])
    three_c, c = w.shape
    dh = three_c // (3 * num_heads)
    w = w.reshape(num_heads, 3, dh, c).transpose(1, 0, 2, 3).reshape(three_c, c)
    b = b.reshape(num_heads, 3, dh).transpose(1, 0, 2).reshape(three_c)
    return {"kernel": np.ascontiguousarray(w.T), "bias": b}


def convert_atom_decoder(sd: dict, num_layers: int = 8, d: int = 512) -> dict:
    """Map the reference MotionDecoder state_dict (AToM/model/model.py:242-383)
    onto our MotionDecoder param tree. Dead reference modules (face_mlp,
    to_face_cond/tokens, pos_* path, input_projection, decoder linear1/2) are
    intentionally dropped."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: dict = {
        "input_projection_lip": _lin(sd, "input_projection_lip"),
        "input_projection_wo_lip": _lin(sd, "input_projection_wo_lip"),
        "cond_projection": _lin(sd, "cond_projection"),
        "face_projection": _lin(sd, "face_projection"),
        "time_mlp": _lin(sd, "time_mlp.1"),
        "to_time_cond": _lin(sd, "to_time_cond.0"),
        "to_time_tokens": _lin(sd, "to_time_tokens.0"),
        "norm_cond": _ln(sd, "norm_cond"),
        "final_layer": _lin(sd, "final_layer"),
        "null_cond_embed": sd["null_cond_embed"],
        "null_cond_hidden": sd["null_cond_hidden"],
        "face_null_cond_embed": sd["face_null_cond_embed"],
    }
    for enc in ("cond_encoder", "face_encoder"):
        for i in range(2):
            p[f"{enc}_{i}"] = _encoder_layer(sd, f"{enc}.{i}", d)
    for proj in ("non_attn_cond_projection", "non_attn_face_projection"):
        p[f"{proj}_ln"] = _ln(sd, f"{proj}.0")
        p[f"{proj}_fc1"] = _lin(sd, f"{proj}.1")
        p[f"{proj}_fc2"] = _lin(sd, f"{proj}.3")
    for i in range(num_layers):
        p[f"decoder_{i}"] = _decoder_layer(sd, f"seqTransDecoder.stack.{i}", d)
    return {"params": p}


# --------------------------------------------------------------------------
# MToV ViT autoencoder (MToV/models/autoencoder/autoencoder_vit.py)
# --------------------------------------------------------------------------

def _timesformer_block(sd: dict, prefix: str, i: int) -> dict:
    """reference layers.{i} = [PreNorm(time_attn), PreNorm(space_attn),
    PreNorm(ff)] (vit_modules.py:199-207)."""
    out = {}
    for j, (norm_name, attn_name) in enumerate(
            [("time_norm", "time_attn"), ("space_norm", "space_attn")]):
        p = f"{prefix}.layers.{i}.{j}"
        out[norm_name] = _ln(sd, f"{p}.norm")
        out[attn_name] = {
            "to_qkv": _lin_nobias(sd, f"{p}.fn.to_qkv"),
            "to_out": _lin(sd, f"{p}.fn.to_out.0"),
        }
    p = f"{prefix}.layers.{i}.2"
    out["ff_norm"] = _ln(sd, f"{p}.norm")
    out["ff"] = {"fc1": _lin(sd, f"{p}.fn.net.0"),
                 "fc2": _lin(sd, f"{p}.fn.net.3")}
    return out


def _timesformer(sd: dict, prefix: str, depth: int,
                 with_patch: bool) -> dict:
    out = {}
    if with_patch:
        out["to_patch_embedding"] = _lin(sd, f"{prefix}.to_patch_embedding")
    for i in range(depth):
        out[f"block_{i}"] = _timesformer_block(sd, prefix, i)
    return out


def _quant_attn(sd: dict, prefix: str, depth: int) -> dict:
    """autoencoder_vit.Transformer: layers.{i} = [PreNorm(Attention),
    PreNorm(FeedForward)] (autoencoder_vit.py:65-83)."""
    out = {}
    for i in range(depth):
        attn = f"{prefix}.layers.{i}.0"
        ff = f"{prefix}.layers.{i}.1"
        out[f"attn_norm_{i}"] = _ln(sd, f"{attn}.norm")
        out[f"to_qkv_{i}"] = _lin_nobias(sd, f"{attn}.fn.to_qkv")
        out[f"to_out_{i}"] = _lin(sd, f"{attn}.fn.to_out.0")
        out[f"ff_norm_{i}"] = _ln(sd, f"{ff}.norm")
        out[f"ff1_{i}"] = _lin(sd, f"{ff}.fn.net.0")
        out[f"ff2_{i}"] = _lin(sd, f"{ff}.fn.net.3")
    return out


def convert_vit_autoencoder(sd: dict, depth: int = 8,
                            quant_depth: int = 4) -> dict:
    """Map a reference ViTAutoencoder state_dict onto our param tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: dict = {
        "encoder": _timesformer(sd, "encoder", depth, with_patch=True),
        "decoder": _timesformer(sd, "decoder", depth, with_patch=False),
        "xy_token": sd["xy_token"],
        "yt_token": sd["yt_token"],
        "xt_token": sd["xt_token"],
        "xy_pos_embedding": sd["xy_pos_embedding"],
        "yt_pos_embedding": sd["yt_pos_embedding"],
        "xt_pos_embedding": sd["xt_pos_embedding"],
        "xy_quant_attn": _quant_attn(sd, "xy_quant_attn", quant_depth),
        "yt_quant_attn": _quant_attn(sd, "yt_quant_attn", quant_depth),
        "xt_quant_attn": _quant_attn(sd, "xt_quant_attn", quant_depth),
    }
    for name in ("pre_xy", "pre_yt", "pre_xt", "post_xy", "post_yt",
                 "post_xt"):
        p[name] = _conv1x1_as_dense(sd, name)
    # ConvTranspose2d weight [I, O, kh, kw] → flax ConvTranspose with
    # transpose_kernel=True expects [kh, kw, O, I]
    w = np.asarray(sd["to_pixel.1.weight"])
    p["to_pixel"] = {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bias": np.asarray(sd["to_pixel.1.bias"]),
    }
    return {"params": p}


# --------------------------------------------------------------------------
# MToV triplane UNet (MToV/models/ddpm/unet.py)
# --------------------------------------------------------------------------

def _unet_resblock(sd: dict, prefix: str, has_skip: bool) -> dict:
    out = {
        "in_norm": _gn(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _lin(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _gn(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if has_skip:
        out["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _unet_attn(sd: dict, prefix: str, num_heads: int) -> dict:
    return {
        "norm": _gn(sd, f"{prefix}.norm"),
        "qkv": _qkv_headmajor_to_qkvmajor(sd, f"{prefix}.qkv", num_heads),
        "proj_out": _conv1x1_as_dense(sd, f"{prefix}.proj_out"),
    }


def convert_triplane_unet(sd: dict, model_channels: int = 128,
                          num_res_blocks: int = 2,
                          channel_mult=(1, 2, 4, 4),
                          attention_resolutions=(4, 2, 1),
                          num_heads: int = 8) -> dict:
    """Map a reference UNetModel state_dict onto our TriplaneUNet tree.

    Walks the reference module layout (unet.py:710-975) in construction
    order, mirroring the index bookkeeping of the constructor. The unused
    ``output_bg_*`` branches are skipped.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    mc = model_channels
    p: dict = {
        "time_embed_1": _lin(sd, "time_embed.0"),
        "time_embed_2": _lin(sd, "time_embed.2"),
        "input_conv": _conv(sd, "input_blocks.0.0"),
        "out_norm": _gn(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
    }

    def has_skip(prefix):
        return f"{prefix}.skip_connection.weight" in sd

    # ---- input path
    i_res = 0          # our in_res_{i}
    i_attn2d = 0       # position in in_attn2d (None-aware naming below)
    block_idx = 1      # reference input_blocks index
    ch = mc
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            prefix = f"input_blocks.{block_idx}.0"
            p[f"in_res_{i_res}"] = _unet_resblock(sd, prefix, has_skip(prefix))
            ch = mult * mc
            if ds in attention_resolutions:
                p[f"in_attn2d_{i_attn2d}"] = _unet_attn(
                    sd, f"input_blocks.{block_idx}.1", num_heads)
            p[f"in_joint_{i_res + 1}"] = _unet_attn(
                sd, f"input_attns.{block_idx}", num_heads)
            i_res += 1
            i_attn2d += 1
            block_idx += 1
        if level != len(channel_mult) - 1:
            prefix = f"input_blocks.{block_idx}.0"
            p[f"in_res_{i_res}"] = _unet_resblock(sd, prefix, has_skip(prefix))
            p[f"in_joint_{i_res + 1}"] = _unet_attn(
                sd, f"input_attns.{block_idx}", num_heads)
            i_res += 1
            i_attn2d += 1
            block_idx += 1
            ds *= 2

    # ---- middle
    p["mid_res1"] = _unet_resblock(sd, "middle_block.0",
                                   has_skip("middle_block.0"))
    p["mid_attn2d"] = _unet_attn(sd, "middle_block.1", num_heads)
    p["mid_res2"] = _unet_resblock(sd, "middle_block.2",
                                   has_skip("middle_block.2"))
    p["mid_joint"] = _unet_attn(sd, "mid_attn", num_heads)

    # ---- output path
    o = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            prefix = f"output_blocks.{o}.0"
            p[f"out_res_{o}"] = _unet_resblock(sd, prefix, has_skip(prefix))
            ch = mult * mc
            li = 1
            if ds in attention_resolutions:
                p[f"out_attn2d_{o}"] = _unet_attn(
                    sd, f"output_blocks.{o}.{li}", num_heads)
                li += 1
            if level and i == num_res_blocks:
                up_prefix = f"output_blocks.{o}.{li}"
                p[f"out_up_{o}"] = _unet_resblock(sd, up_prefix,
                                                  has_skip(up_prefix))
                ds //= 2
            p[f"out_joint_{o}"] = _unet_attn(sd, f"output_attns.{o}",
                                             num_heads)
            o += 1
    return {"params": p}


# --------------------------------------------------------------------------
# LPIPS (losses/lpips.py): torchvision VGG16 features + richzhang lin heads
# --------------------------------------------------------------------------

def convert_lpips(vgg_features_sd: dict, lpips_sd: dict) -> dict:
    """Build our LPIPS param tree from torch weights.

    ``vgg_features_sd``: torchvision ``vgg16().features`` state_dict
    (conv layers at indices 0,2,5,7,10,12,14,17,19,21,24,26,28);
    ``lpips_sd``: the richzhang ``vgg.pth`` checkpoint with keys
    ``lin{k}.model.1.weight`` [1, C, 1, 1].
    """
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params: dict = {"net": {}}
    for i, idx in enumerate(conv_indices):
        w = np.asarray(vgg_features_sd[f"{idx}.weight"])
        b = np.asarray(vgg_features_sd[f"{idx}.bias"])
        params["net"][f"conv_{i}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": b,
        }
    for k in range(5):
        w = np.asarray(lpips_sd[f"lin{k}.model.1.weight"])  # [1, C, 1, 1]
        params[f"lin_{k}"] = w[0, :, 0, 0].reshape(-1, 1)
    return {"params": params}
