"""InceptionI3D (Kinetics-400) feature network for FVD, in flax.

Re-implements ``MToV/evals/fvd/pytorch_i3d.py`` (itself a port of the public
TF kinetics-i3d): Unit3D = TF-SAME-padded Conv3D + BatchNorm + ReLU, nine
Inception mixed blocks, [2,7,7] average pool, 400-class logits averaged over
time. Weights port from the reference's ``i3d_pretrained_400.pt`` via
``convert_i3d`` below.

Input is channels-last [B, T, H, W, 3] in [-1, 1] (224²). Runs in inference
mode only (BatchNorm running statistics) — FVD never trains this network.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _same_pad(size: int, k: int, s: int) -> tuple[int, int]:
    """TF-SAME padding (ref pytorch_i3d.py:71-97)."""
    if size % s == 0:
        pad = max(k - s, 0)
    else:
        pad = max(k - size % s, 0)
    return pad // 2, pad - pad // 2


class Unit3D(nn.Module):
    features: int
    kernel: tuple[int, int, int] = (1, 1, 1)
    stride: tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    relu: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        pads = [(0, 0)]
        for d in range(3):
            pads.append(_same_pad(x.shape[1 + d], self.kernel[d],
                                  self.stride[d]))
        pads.append((0, 0))
        x = jnp.pad(x, pads)
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding="VALID", use_bias=self.use_bias,
                    name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name="bn")(x)
        if self.relu:
            x = jax.nn.relu(x)
        return x


def _max_pool_same(x, kernel, stride):
    pads = [(0, 0)]
    for d in range(3):
        pads.append(_same_pad(x.shape[1 + d], kernel[d], stride[d]))
    pads.append((0, 0))
    x = jnp.pad(x, pads, constant_values=-jnp.inf)
    return nn.max_pool(x, kernel, strides=stride, padding="VALID")


class InceptionModule(nn.Module):
    out_channels: tuple[int, ...]  # (b0, b1a, b1b, b2a, b2b, b3b)

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        b0 = Unit3D(oc[0], name="b0")(x)
        b1 = Unit3D(oc[2], (3, 3, 3), name="b1b")(
            Unit3D(oc[1], name="b1a")(x))
        b2 = Unit3D(oc[4], (3, 3, 3), name="b2b")(
            Unit3D(oc[3], name="b2a")(x))
        b3 = Unit3D(oc[5], name="b3b")(
            _max_pool_same(x, (3, 3, 3), (1, 1, 1)))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class InceptionI3d(nn.Module):
    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        """x: [B, T, H, W, 3] → logits [B, num_classes]."""
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule(_MIXED["Mixed_3b"], name="Mixed_3b")(x)
        x = InceptionModule(_MIXED["Mixed_3c"], name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for k in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(_MIXED[k], name=k)(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule(_MIXED["Mixed_5b"], name="Mixed_5b")(x)
        x = InceptionModule(_MIXED["Mixed_5c"], name="Mixed_5c")(x)
        # avg_pool kernel [2,7,7] stride 1, then logits unit, mean over time
        x = nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1), padding="VALID")
        x = Unit3D(self.num_classes, use_bn=False, relu=False, use_bias=True,
                   name="logits")(x)
        x = x.squeeze(3).squeeze(2)  # spatial squeeze → [B, T', C]
        return x.mean(axis=1)


def convert_i3d(sd: dict) -> dict:
    """reference state_dict → flax params/batch_stats trees."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def unit(dst_params, dst_stats, prefix):
        w = sd[f"{prefix}.conv3d.weight"]  # [O, I, kt, kh, kw]
        conv = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))}
        if f"{prefix}.conv3d.bias" in sd:
            conv["bias"] = sd[f"{prefix}.conv3d.bias"]
        dst_params["conv3d"] = conv
        if f"{prefix}.bn.weight" in sd:
            dst_params["bn"] = {"scale": sd[f"{prefix}.bn.weight"],
                                "bias": sd[f"{prefix}.bn.bias"]}
            dst_stats["bn"] = {"mean": sd[f"{prefix}.bn.running_mean"],
                               "var": sd[f"{prefix}.bn.running_var"]}

    for name in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"):
        params[name], stats[name] = {}, {}
        unit(params[name], stats[name], name)
    for name in _MIXED:
        params[name], stats[name] = {}, {}
        for branch in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            params[name][branch], stats[name][branch] = {}, {}
            unit(params[name][branch], stats[name][branch],
                 f"{name}.{branch}")
    params["logits"], stats["logits"] = {}, {}
    unit(params["logits"], stats["logits"], "logits")
    return {"params": params, "batch_stats": _prune_empty(stats)}


def _prune_empty(tree):
    if isinstance(tree, dict):
        out = {k: _prune_empty(v) for k, v in tree.items()}
        return {k: v for k, v in out.items()
                if not (isinstance(v, dict) and len(v) == 0)}
    return tree
