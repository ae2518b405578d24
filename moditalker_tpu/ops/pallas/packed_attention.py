"""Packed multi-head self-attention for small head dims (Pallas).

The triplane UNet's attentions have C=128..512 with 8 heads → dh=16..64
(ref unet.py:210-300: AttentionBlock / AttentionBlock1D with num_heads=8).
dh=16 is MXU-hostile: the standard head-split layout feeds 16-lane operands
(87% of every DMA wasted) and 16-deep contractions (12.5% MXU depth).

This kernel keeps all H heads packed in the channel axis and isolates each
head with a lane mask instead of a slice:

    s_h = q · (k ⊙ m_h)ᵀ        (full-C contraction — masked lanes add 0)
    out += softmax(s_h) · (v ⊙ m_h)   (disjoint lanes ⇒ bf16 accumulate exact)

Every matmul contracts the full channel width and every DMA moves full
128-lane rows. The FLOP count is H× the "useful" count, but at full MXU
rate that equals the head-split layout's theoretical floor (dh/128 depth
utilization) — and none of its layout overhead: no 4D head transposes, no
narrow loads, and the [L, L] per-head score tile never leaves VMEM.

Input is the packed qkv projection [B, L, 3C] ([q|k|v] thirds, heads
contiguous inside each third — exactly what nn.Dense(3C) produces), output
[B, L, C] ready for the out-projection. Backward recomputes through the
XLA reference path. Parity: tests/test_pallas.py (interpret mode).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..attention import _ledger_record, _xla_sdpa

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_LANES = 128


# --------------------------------------------------------------- reference
def packed_attention_reference(qkv, heads: int, scale: float,
                               use_flash: bool = False):
    """Head-split reference semantics on packed qkv [B, L, 3C] → [B, L, C]."""
    b, l, c3 = qkv.shape
    c = c3 // 3
    dh = c // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):  # [B, L, C] -> [B, H, L, dh]
        return t.reshape(b, l, heads, dh).transpose(0, 2, 1, 3)

    if use_flash:
        from ..attention import sdpa

        out = sdpa(split(q), split(k), split(v), scale=scale)
    else:
        out = _xla_sdpa(split(q) * scale, split(k), split(v))
    return out.transpose(0, 2, 1, 3).reshape(b, l, c)


@functools.lru_cache(maxsize=None)
def _head_masks(heads: int, c: int) -> np.ndarray:
    dh = c // heads
    m = np.zeros((heads, c), np.float32)
    for h in range(heads):
        m[h, h * dh:(h + 1) * dh] = 1.0
    return m


# ------------------------------------------------------------------ kernel
def _packed_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, heads):
    # VPU economy (round 3): ``scale`` folded into q ONCE ([BLK, C]); the
    # softmax denominator divides the [BLK, C] per-head OUTPUT rows instead
    # of the [BLK, L] probability tile (exact: out_h = (p @ v_h) / l).
    #
    # Head isolation via q-side masks (round 4): (q⊙m)·kᵀ == q·(k⊙m)ᵀ and
    # (p@v)⊙m == p@(v⊙m) for 0/1 lane masks (bit-identical: ×1.0 and ×0
    # are exact), so masking happens on the [BLK, C] query blocks and the
    # output fold, never on [L, C] k/v tiles.
    # VPU economy (round 4, v3): on-chip attribution (tools/ab_packed.py
    # diag) showed the per-head matmuls ALONE at 914 us of the 953 us
    # kernel — softmax was already hidden behind the MXU; 16 small matmuls
    # per grid step ran the MXU at 38%. v3 stacks the 8 masked q-blocks
    # into ONE [H·BLK, C] query, so each grid step is exactly TWO
    # monolithic matmuls (score [H·BLK, L], value [H·BLK, C]) — same raw
    # FLOPs, far better MXU pipelining — and one head-fold at the end.
    q = q_ref[0]                                   # [BLK, C]
    k = k_ref[0]                                   # [L, C]
    v = v_ref[0]
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    masks = m_ref[...].astype(qs.dtype)            # [H, C]
    qm = jnp.concatenate(
        [qs * masks[h:h + 1] for h in range(heads)], axis=0)  # [H·BLK, C]
    s = jax.lax.dot_general(qm, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    mx = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    l = p.sum(axis=-1, keepdims=True)              # [H·BLK, 1]
    pv = jnp.dot(p.astype(v.dtype), v,
                 preferred_element_type=jnp.float32)
    pv = pv / l                                    # [H·BLK, C]
    blk = q.shape[0]
    out = jnp.zeros(q.shape, jnp.float32)
    for h in range(heads):                         # disjoint-lane head fold
        out = out + pv[h * blk:(h + 1) * blk] * masks[h:h + 1]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "block_q", "interpret"))
def _packed_fused(qkv, heads: int, scale: float, block_q: int,
                  interpret: bool = False):
    b, l, c3 = qkv.shape
    c = c3 // 3
    masks = jnp.asarray(_head_masks(heads, c))
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, heads=heads),
        grid=(b, l // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 1)),
            pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 2)),
            pl.BlockSpec((heads, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, c), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, masks)


# --------------------------------------------------------------- dispatch
def _block_q(l: int, c: int) -> int:
    # v3 stacks all H heads' masked queries, so the live fp32 score tile is
    # [H·BLK, L]: budget H·BLK·L·4 ≤ 4 MB (plus the bf16 exp tile ~2 MB and
    # k/v ~1 MB keeps the scoped-VMEM stack well under the chip's 16 MB —
    # round 3's compile OOM came from overshooting that limit).
    heads = max(c // 16, 1)            # dh=16 at every viable shape (gate)
    for blk in (512, 256, 128, 64, 32, 16, 8):
        if l % blk == 0 and heads * blk * l * 4 <= 4 * 1024 * 1024:
            return blk
    return 0


def packed_attention_viable(l: int, c: int, heads: int) -> bool:
    if (not _HAS_PALLAS or os.environ.get("MODITALKER_NO_FLASH_ATTN")
            or os.environ.get("MODITALKER_NO_PACKED_ATTN")):
        return False
    # Measured on v5e (bf16): wins only at the dh=16 long-sequence shapes
    # ([4,2048,128]×8h: 1.62 vs 1.91 ms; ties at L=1024) — larger head dims
    # contract deep enough that the head-split flash path is faster
    # ([4,512,256]×8h dh=32: 1.83 vs 1.12 ms against this kernel).
    # MODITALKER_PACKED_MIN_L overrides the L floor for A/B runs (the ds=1
    # ytxt 2D attention is [2B, 512, 128]×8h, just under the default gate).
    min_l = int(os.environ.get("MODITALKER_PACKED_MIN_L", "1024"))
    return (c % _LANES == 0 and c % heads == 0 and c // heads == 16
            and min_l <= l <= 4096 and l % 8 == 0 and _block_q(l, c) > 0
            and l * c * 2 * 2 <= 4 * 1024 * 1024)  # k+v resident in VMEM


def packed_attention(qkv, heads: int, scale: float, interpret: bool = False):
    """Multi-head self-attention on packed qkv [B, L, 3C] → [B, L, C].

    Pallas on TPU at viable shapes; head-split XLA reference elsewhere
    (and always for backward).
    """
    b, l, c3 = qkv.shape
    c = c3 // 3
    if not packed_attention_viable(l, c, heads):
        return packed_attention_reference(qkv, heads, scale, use_flash=True)

    sc = float(scale)
    blk = _block_q(l, c)

    def ref_plain(t):
        return packed_attention_reference(t, heads, sc, use_flash=False)

    @jax.custom_vjp
    def fused(t):
        return _packed_fused(t, heads, sc, blk, interpret)

    def fwd(t):
        return _packed_fused(t, heads, sc, blk, interpret), (t,)

    def bwd(res, g):
        (t,) = res
        _, vjp = jax.vjp(ref_plain, t)
        return vjp(g)

    fused.defvjp(fwd, bwd)

    # ledger: useful attention FLOPs (4·L²·dh per head per batch)
    _ledger_record(4.0 * b * heads * l * l * (c // heads))
    if interpret:
        return fused(qkv)
    return jax.lax.platform_dependent(qkv, tpu=fused, default=ref_plain)
