"""Attention primitives.

One einsum-based scaled-dot-product core used everywhere (the reference has
five near-identical attention implementations: AToM nn.MultiheadAttention,
MToV vit_modules.Attention, autoencoder_vit.Attention, unet QKVAttention(Legacy),
unet CrossAttention). Softmax is computed in float32 regardless of compute
dtype, matching the reference's fp16-stability practice (unet.py:324).

For large token counts the Pallas flash-attention kernel in
``ops.pallas.flash_attention`` can be swapped in; shapes in this model family
(<= 16k tokens) are well inside XLA's comfort zone, so the einsum path is the
default and the Pallas path is an opt-in fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over the last two axes.

    q: [..., Nq, D], k/v: [..., Nk, D]. Any leading batch/head axes.
    If ``scale`` is None, q is assumed pre-scaled.
    """
    if scale is not None:
        q = q * scale
    sim = jnp.einsum("...id,...jd->...ij", q, k,
                     preferred_element_type=jnp.float32)
    if mask is not None:
        sim = jnp.where(mask, sim, jnp.finfo(sim.dtype).min)
    if q.dtype == jnp.bfloat16:
        # bf16 compute: the [N, N] score tensor is the dominant HBM traffic
        # of every attention in this model family (it cannot fuse across the
        # two matmuls). Materialize it in bf16 — the casts fuse into the
        # matmul epilogue / softmax kernel, halving score traffic, while all
        # reductions (max, sum) still run in fp32 inside the softmax fusion.
        sim = sim.astype(jnp.bfloat16)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("...ij,...jd->...id", attn, v)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, N, H*D] -> [B, H, N, D]"""
    b, n, hd = x.shape
    d = hd // num_heads
    return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, N, D] -> [B, N, H*D]"""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def multi_head_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-head attention on already-projected q/k/v of shape [B, N, H*D].

    Scaling: standard 1/sqrt(head_dim) on q.
    """
    d = q.shape[-1] // num_heads
    qh = split_heads(q, num_heads)
    kh = split_heads(k, num_heads)
    vh = split_heads(v, num_heads)
    out = sdpa(qh, kh, vh, scale=d**-0.5, mask=mask)
    return merge_heads(out)


def sdpa_fused(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """SDPA via the Pallas fused kernel when profitable, XLA otherwise.

    Accepts [..., N, D]; all leading axes are folded into the kernel batch.
    The fused kernel never materializes the [N, N] score matrix in HBM — the
    dominant cost of the triplane joint attention (2048 tokens) and the
    TimeSformer space attention (1024 tokens/frame) on TPU.
    """
    from .pallas.flash_attention import fused_attention  # lazy: avoid cycle

    lead = q.shape[:-2]
    nq, d = q.shape[-2:]
    nk = k.shape[-2]
    if nk < 256:  # small sequences: XLA fusion already wins
        return sdpa(q, k, v, scale=scale)
    qf = q.reshape(-1, nq, d)
    kf = k.reshape(-1, nk, d)
    vf = v.reshape(-1, nk, d)
    out = fused_attention(qf, kf, vf, scale=scale)
    return out.reshape(*lead, nq, d)
