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
