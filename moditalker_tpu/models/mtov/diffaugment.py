"""Differentiable GAN augmentation (color / translation / cutout).

Re-implements ``MToV/losses/diffaugment.py`` (zhaos' DiffAugment). Note the
reference imports it into the perceptual loss but never invokes it on the
active path (perceptual.py:10 — SURVEY.md §2.2); provided here for
completeness and opt-in use in the first-stage trainer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(key, x):
    b = x.shape[0]
    r = jax.random.uniform(key, (b, 1, 1, 1), x.dtype) - 0.5
    return x + r


def rand_saturation(key, x):
    b = x.shape[0]
    r = jax.random.uniform(key, (b, 1, 1, 1), x.dtype) * 2
    mean = x.mean(axis=-1, keepdims=True)
    return (x - mean) * r + mean


def rand_contrast(key, x):
    b = x.shape[0]
    r = jax.random.uniform(key, (b, 1, 1, 1), x.dtype) + 0.5
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    return (x - mean) * r + mean


def rand_translation(key, x, ratio: float = 0.125):
    b, h, w, c = x.shape
    sh, sw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    k1, k2 = jax.random.split(key)
    tx = jax.random.randint(k1, (b,), -sh, sh + 1)
    ty = jax.random.randint(k2, (b,), -sw, sw + 1)
    pad = jnp.pad(x, ((0, 0), (sh, sh), (sw, sw), (0, 0)))

    def shift_one(img, dx, dy):
        return jax.lax.dynamic_slice(
            img, (sh + dx, sw + dy, 0), (h, w, c))

    return jax.vmap(shift_one)(pad, tx, ty)


def rand_cutout(key, x, ratio: float = 0.5):
    b, h, w, c = x.shape
    ch, cw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    k1, k2 = jax.random.split(key)
    ox = jax.random.randint(k1, (b,), 0, h + (1 - ch % 2))
    oy = jax.random.randint(k2, (b,), 0, w + (1 - cw % 2))
    ys = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    y0 = (ox - ch // 2)[:, None, None]
    x0 = (oy - cw // 2)[:, None, None]
    mask = ((ys >= y0) & (ys < y0 + ch) & (xs >= x0) & (xs < x0 + cw))
    return x * (1.0 - mask[..., None].astype(x.dtype))


AUGMENT_FNS = {
    "color": (rand_brightness, rand_saturation, rand_contrast),
    "translation": (rand_translation,),
    "cutout": (rand_cutout,),
}


def diff_augment(key, x, policy: str = "color,translation,cutout"):
    """x: [B, H, W, C]."""
    if not policy:
        return x
    for p in policy.split(","):
        for fn in AUGMENT_FNS[p.strip()]:
            key, sub = jax.random.split(key)
            x = fn(sub, x)
    return x
