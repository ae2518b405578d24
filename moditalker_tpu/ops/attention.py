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

import functools
import os

import jax
import jax.numpy as jnp


def _xla_sdpa(q, k, v, mask=None):
    """The einsum reference path; q pre-scaled."""
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


def _xla_sdpa_prescale(q, k, v, scale):
    """Non-TPU branch of the platform-dependent dispatch."""
    return _xla_sdpa(q * scale, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_sdpa(q3, k3, v3, scale):
    # forward: Pallas kernel picked by shape (scores never leave VMEM);
    # dispatch already validated viability before calling
    from .pallas.flash_attention import (onepass_attention,  # lazy: cycle
                                         onepass_attention_viable,
                                         tiny_attention)

    if onepass_attention_viable(q3.shape[1], k3.shape[1], q3.shape[2]):
        return onepass_attention(q3, k3, v3, scale)
    return tiny_attention(q3, k3, v3, scale)


def _flash_sdpa_fwd(q3, k3, v3, scale):
    return _flash_sdpa(q3, k3, v3, scale), (q3, k3, v3)


def _flash_sdpa_bwd(scale, res, g):
    # backward: recompute probabilities and use the standard
    # softmax-attention adjoints. NOTE the memory profile: s and the two
    # [B, N, N] probability/edge tensors here are fp32 (dp must be fp32 for
    # the ds reduction), ~2× the transient HBM of the bf16-score einsum
    # path — acceptable because training at these shapes is compute-bound,
    # but budget for it when sizing training batches.
    q, k, v = res
    s = jnp.einsum("bid,bjd->bij", q * scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    pv = p.astype(v.dtype)
    dv = jnp.einsum("bij,bid->bjd", pv, g)
    dp = jnp.einsum("bid,bjd->bij", g, v,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    dq = jnp.einsum("bij,bjd->bid", ds, k) * scale
    dk = jnp.einsum("bij,bid->bjd", ds, q) * scale
    return dq, dk, dv


_flash_sdpa.defvjp(_flash_sdpa_fwd, _flash_sdpa_bwd)

# Trace-time FLOP ledger: XLA's ``compiled.cost_analysis()`` cannot see
# inside Pallas custom calls, so every flash-dispatched sdpa records its
# analytic matmul FLOPs (qkᵀ + pv = 4·B·N²·D) here while tracing. The ledger
# is ARMED only between reset and read (bench's reset→lower→read window):
# retraces outside that window — training retraces, concurrent jits in a
# long-lived process — neither skew the count nor accumulate unboundedly.
_flash_ledger = {"armed": False, "flops": 0.0}


def reset_flash_flop_ledger() -> None:
    """Arm the ledger and zero it (call immediately before lowering)."""
    _flash_ledger["armed"] = True
    _flash_ledger["flops"] = 0.0


def flash_flop_ledger() -> float:
    """Read and DISARM the ledger (call right after lowering)."""
    _flash_ledger["armed"] = False
    return float(_flash_ledger["flops"])


def _ledger_record(flops: float) -> None:
    if _flash_ledger["armed"]:
        _flash_ledger["flops"] += flops


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

    On TPU, mask-free self-attention dispatches to a Pallas kernel at the
    shapes where one wins (measured, v5e):
      * N ≥ 1024 → single-pass whole-KV-in-VMEM kernel, 2.2–2.4× over the
        einsum path (triplane joint attn [32,2048,16] 1549→658 us,
        TimeSformer space attn [384,1024,64] 3841→1741 us) — the [N, N]
        score tensor never touches HBM;
      * N ≤ 32 with a large folded batch → chunked tiny-L kernel, 1.5×
        (TimeSformer time attn [98304,16,64] 7.8→5.2 ms) — XLA's batched
        tiny matmuls run at ~2 TF/s, the chunk kernel keeps each chunk's
        scores/softmax in VMEM.
    Backward falls back to the XLA adjoints (see ``_flash_sdpa_bwd``). Set
    ``MODITALKER_NO_FLASH_ATTN=1`` to force the einsum path everywhere.
    """
    from .pallas.flash_attention import (onepass_attention_viable,
                                         tiny_attention_viable)

    nq, d = q.shape[-2], q.shape[-1]
    nk = k.shape[-2]
    b3 = 1
    for s in q.shape[:-2]:
        b3 *= int(s)
    if (mask is None
            and not os.environ.get("MODITALKER_NO_FLASH_ATTN")
            and (onepass_attention_viable(nq, nk, d)
                 or tiny_attention_viable(b3, nq, nk, d))):
        lead = q.shape[:-2]
        _ledger_record(4.0 * b3 * nq * nk * d)
        sc = 1.0 if scale is None else float(scale)
        q3 = q.reshape(-1, nq, d)
        k3 = k.reshape(-1, nk, d)
        v3 = v.reshape(-1, nk, d)
        # Per-LOWERING platform choice (not per-trace): a program traced on
        # a TPU host but lowered for another backend must not bake in the
        # TPU-only Pallas call (jit backend override, AOT cross-lowering).
        out = jax.lax.platform_dependent(
            q3, k3, v3,
            tpu=lambda a, b, c: _flash_sdpa(a, b, c, sc),
            default=lambda a, b, c: _xla_sdpa_prescale(a, b, c, sc),
        )
        return out.reshape(*lead, nq, d)
    if scale is not None:
        q = q * scale
    return _xla_sdpa(q, k, v, mask)


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
