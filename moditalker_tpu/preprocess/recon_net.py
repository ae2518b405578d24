"""Deep3DFaceRecon coefficient regressor: ResNet-50 → 257 coeffs, in flax.

Re-implements the inference path of
``deep_3drecon/deep_3drecon_models/networks.py:70-106`` (ReconNetWrapper with
``use_last_fc=False``): a torchvision-layout ResNet-50 trunk (avg-pooled to
[B,1,1,2048]) followed by seven zero-init 1×1 heads — id(80), exp(64),
tex(80), angle(3), gamma(27), tx/ty(2), tz(1) — concatenated to 257.
Weights port from the reference ``epoch_20.pth`` facerecon checkpoint via
``convert_recon_net``. Input is NHWC 224² RGB (the BFM-aligned crop).

The training-only branches of the reference FaceReconModel (arcface
perceptual/photo/landmark losses, pytorch3d renderer) are intentionally not
reproduced — no MoDiTalker entry point uses them (SURVEY.md §2.5).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

COEFF_SPLITS = (80, 64, 80, 3, 27, 2, 1)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       epsilon=1e-5, dtype=d, name=name)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=d,
                    name="conv1")(x)
        y = jax.nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=d, name="conv2")(y)
        y = jax.nn.relu(bn("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=d,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=self.strides, use_bias=False,
                               dtype=d, name="ds_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    epsilon=1e-5, dtype=d,
                                    name="ds_bn")(residual)
        return jax.nn.relu(y + residual)


class ResNet50Trunk(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = jax.nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        for li, (blocks, feats, stride) in enumerate(
                [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]):
            for bi in range(blocks):
                x = Bottleneck(
                    feats, strides=stride if bi == 0 else 1,
                    downsample=(bi == 0), dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}")(x, train)
        return x.mean(axis=(1, 2), keepdims=True)  # [B,1,1,2048]


class ReconNet(nn.Module):
    """ResNet-50 + seven 1×1 coefficient heads → [B, 257].

    ``dtype=jnp.bfloat16`` runs the conv trunk in bf16 (params and the
    coefficient heads stay fp32) — the TPU eval mode; default fp32
    matches the torch reference bit-for-bit in the parity tests."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ResNet50Trunk(dtype=self.dtype, name="backbone")(x, train)
        h = h.astype(jnp.float32)
        outs = []
        for i, dim in enumerate(COEFF_SPLITS):
            outs.append(nn.Dense(dim, kernel_init=nn.initializers.zeros,
                                 name=f"head_{i}")(h))
        return jnp.concatenate(outs, axis=-1).reshape(x.shape[0], 257)


def convert_recon_net(sd: dict) -> dict:
    """reference ReconNetWrapper state_dict → flax params/batch_stats."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {"backbone": {}}
    stats: dict = {"backbone": {}}

    def conv(name):
        w = sd[f"{name}.weight"]
        return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}

    def bn(name):
        return ({"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]},
                {"mean": sd[f"{name}.running_mean"],
                 "var": sd[f"{name}.running_var"]})

    bb = "backbone"
    params["backbone"]["conv1"] = conv(f"{bb}.conv1")
    params["backbone"]["bn1"], stats["backbone"]["bn1"] = bn(f"{bb}.bn1")
    for li, blocks in enumerate([3, 4, 6, 3]):
        for bi in range(blocks):
            p, s = {}, {}
            pre = f"{bb}.layer{li + 1}.{bi}"
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = conv(f"{pre}.conv{ci}")
                p[f"bn{ci}"], s[f"bn{ci}"] = bn(f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                p["ds_conv"] = conv(f"{pre}.downsample.0")
                p["ds_bn"], s["ds_bn"] = bn(f"{pre}.downsample.1")
            params["backbone"][f"layer{li + 1}_{bi}"] = p
            stats["backbone"][f"layer{li + 1}_{bi}"] = s
    for i in range(7):
        w = sd[f"final_layers.{i}.weight"][:, :, 0, 0]  # [O, I]
        params[f"head_{i}"] = {
            "kernel": np.ascontiguousarray(w.T),
            "bias": sd[f"final_layers.{i}.bias"],
        }
    return {"params": params, "batch_stats": stats}
