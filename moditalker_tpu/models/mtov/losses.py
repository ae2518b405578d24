"""MToV first-stage losses: LPIPS, PatchGAN discriminators, hinge/feature-
matching GAN objectives.

Re-implements ``MToV/losses/perceptual.py`` + ``MToV/losses/lpips.py``:
  * LPIPS = VGG16 features at relu{1_2,2_2,3_3,4_3,5_3}, channel-normalized,
    squared diff, 1×1 lin heads, spatial mean. Weights are ported from the
    torch checkpoints (torchvision VGG16 + richzhang ``vgg.pth``) via
    ``utils.torch_port.convert_lpips``; random-init LPIPS is still a valid
    perceptual-style loss for smoke training.
  * 2D/3D PatchGAN (ndf 64, 3 layers, BatchNorm, LeakyReLU 0.2) with
    intermediate-feature taps for the feature-matching L1.
  * generator/discriminator objectives with the reference weights
    (pixel 4 · L1, perceptual 4, gan 1 hinge, feature-match 4) and the
    random-frame 2D selection (perceptual.py:103-106).

Videos here are [B, T, H, W, 3] channels-last in [-1, 1].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]
# indices (into the conv list) after which LPIPS taps features
_SLICE_ENDS = (2, 4, 7, 10, 13)

LPIPS_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
LPIPS_SCALE = jnp.asarray([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the five LPIPS tap activations.
    Input NHWC."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        conv_i = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_i}")(x)
                x = jax.nn.relu(x)
                conv_i += 1
                if conv_i in _SLICE_ENDS:
                    taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Learned perceptual metric (ref losses/lpips.py:55-98)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        def scale_in(t):
            return (t - LPIPS_SHIFT.astype(t.dtype)) / LPIPS_SCALE.astype(t.dtype)

        net = VGG16Features(self.dtype, name="net")
        f0 = net(scale_in(x))
        f1 = net(scale_in(y))
        val = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            def normalize(t):
                n = jnp.sqrt(jnp.sum(t**2, axis=-1, keepdims=True))
                return t / (n + 1e-10)

            diff = (normalize(a) - normalize(b)) ** 2
            w = self.param(f"lin_{k}", nn.initializers.ones,
                           (diff.shape[-1], 1))
            # 1×1 conv, no bias; weights are non-negative in the shipped ckpt
            contrib = diff @ jnp.abs(w).astype(diff.dtype)
            val = val + contrib.mean(axis=(1, 2), keepdims=False)
        return val.squeeze(-1)  # [B]


class PatchDiscriminator2D(nn.Module):
    """Pix2pix PatchGAN with intermediate feature taps
    (ref perceptual.py:158-205). Input NHWC."""

    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = []
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=2,
                    dtype=self.dtype, name="conv_0")(x)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4), strides=(2, 2), padding=2,
                        dtype=self.dtype, name=f"conv_{n}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"bn_{n}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = nn.Conv(nf, (4, 4), strides=(1, 1), padding=2, dtype=self.dtype,
                    name=f"conv_{self.n_layers}")(h)
        h = nn.BatchNorm(use_running_average=not train,
                         name=f"bn_{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        logits = nn.Conv(1, (4, 4), strides=(1, 1), padding=2,
                         dtype=self.dtype, name="conv_out")(h)
        feats.append(logits)
        return logits, feats


class PatchDiscriminator3D(nn.Module):
    """Conv3D PatchGAN (ref perceptual.py:208-251). Input [B,T,H,W,C]."""

    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = []
        h = nn.Conv(self.ndf, (4, 4, 4), strides=(2, 2, 2), padding=2,
                    dtype=self.dtype, name="conv_0")(x)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4, 4), strides=(2, 2, 2), padding=2,
                        dtype=self.dtype, name=f"conv_{n}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"bn_{n}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = nn.Conv(nf, (4, 4, 4), strides=(1, 1, 1), padding=2,
                    dtype=self.dtype, name=f"conv_{self.n_layers}")(h)
        h = nn.BatchNorm(use_running_average=not train,
                         name=f"bn_{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        logits = nn.Conv(1, (4, 4, 4), strides=(1, 1, 1), padding=2,
                         dtype=self.dtype, name="conv_out")(h)
        feats.append(logits)
        return logits, feats


def hinge_d_loss(logits_real, logits_fake):
    """ref perceptual.py:25-29"""
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def select_random_frame(video, frame_idx):
    """video [B,T,H,W,C], frame_idx int[B] → [B,H,W,C]
    (ref perceptual.py:103-106)."""
    return jnp.take_along_axis(
        video, frame_idx[:, None, None, None, None], axis=1).squeeze(1)


def adopt_weight(global_step, threshold: int, value: float = 0.0):
    return jnp.where(global_step < threshold, value, 1.0)
