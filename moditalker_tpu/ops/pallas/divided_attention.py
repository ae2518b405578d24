"""Fused divided space/time attention for the TimeSformer trunk (Pallas).

Profiling the trunk on v5e (B4·F16·N1024·D384, the 256² shipped config)
showed the attention *matmuls* were fine but the layout work around them was
not: each DividedAttention ran five 5D transposes (head split, time/space
axis swap, head merge) that shuttle the full activation through HBM, ~16 ms
of every 38.9 ms block — ~130 ms of the 317 ms encoder trunk.

These kernels instead read the packed qkv projection ``[.., N, 3·H·dh]``
straight from HBM in 128-lane column blocks (Mosaic's minimum lane tile):
each block carries ``g = 128/dh`` heads; the per-head score/value sums are
isolated with lane masks on k/v so every matmul contracts a full 128 lanes.
Rotary is applied in-kernel (rotate-every-two as a block-diagonal ±1
permutation matmul, ref vit_modules.py:8-20) and the output lands already
head-merged in the ``[.., N, H·dh]`` layout the out-projection wants. No 5D
tensor ever exists.

  * space kernel: grid (B·F, H·dh/128); one [N, 128] q/k/v triple per
    instance, full-row softmax in VMEM (N ≤ 2048 ⇒ the fp32 [N, N] score
    tile fits; sub-heads run sequentially so only one tile is live).
  * time kernel: grid (B, N/BN, H·dh/128); blocks [F, BN, 128] attend over
    the F axis via BN-batched dot_generals; [BN, F, F] scores live in VMEM.

Backward falls back to the XLA reference path (recompute); parity with
``divided_attention_reference`` is covered by tests/test_pallas.py in
interpret mode. ref MToV/models/autoencoder/vit_modules.py:120-160.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import rotary
from ..attention import _ledger_record, _xla_sdpa, sdpa

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_LANES = 128


# --------------------------------------------------------------- reference
def divided_attention_reference(qkv, sin, cos, axis: str, heads: int,
                                dim_head: int, scale: float,
                                use_flash: bool = True):
    """Transpose-based reference semantics (the pre-kernel module body).

    qkv: [B, F, N, 3·H·dh] packed as [q|k|v] with heads contiguous inside
    each third. Returns [B, F, N, H·dh]. ``use_flash=False`` forces the
    plain einsum sdpa — used as the ``platform_dependent`` default branch so
    tracing it never double-records the flash FLOP ledger.
    """
    b, f, n, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(t):  # [B,F,N,H*dh] -> [B,H,F,N,dh]
        return t.reshape(b, f, n, heads, dim_head).transpose(0, 3, 1, 2, 4)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    if axis == "time":
        q, k, v = (t.transpose(0, 1, 3, 2, 4) for t in (q, k, v))
    sin = jnp.asarray(sin, qkv.dtype)
    cos = jnp.asarray(cos, qkv.dtype)
    q, k = rotary.apply_rot_emb(q, k, sin, cos)
    if use_flash:
        out = sdpa(q, k, v, scale=scale)
    else:
        out = _xla_sdpa(q * scale, k, v)
    if axis == "time":
        out = out.transpose(0, 1, 3, 2, 4)
    return out.transpose(0, 2, 3, 1, 4).reshape(b, f, n, heads * dim_head)


# ------------------------------------------------------------ static tables
@functools.lru_cache(maxsize=None)
def _head_masks(g: int, dh: int) -> np.ndarray:
    """[g, 128] lane masks, mask i selects lanes [i·dh, (i+1)·dh)."""
    m = np.zeros((g, _LANES), np.float32)
    for i in range(g):
        m[i, i * dh:(i + 1) * dh] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _rot_block(g: int, dh: int) -> np.ndarray:
    """Block-diagonal rotate-every-two permutation for a g-head lane group."""
    return np.kron(np.eye(g, dtype=np.float32), rotary._rot_matrix(dh))


def _tile_tables(sin, cos, g: int):
    """Tile per-head [L, dh] rotary tables across the g-head lane group.
    jnp ops: sin/cos may be tracers when called under jit."""
    sin = jnp.asarray(sin, jnp.float32)
    cos = jnp.asarray(cos, jnp.float32)
    return jnp.tile(sin, (1, g)), jnp.tile(cos, (1, g))


# ----------------------------------------------------------------- kernels
def _apply_rot(x, sin, cos, r, scale: float = 1.0):
    """(x·cos + (x@R)·sin)·scale, result in x.dtype (the ±1 permutation
    matmul is exact; Mosaic requires fp32 accumulation, cast back so the
    score matmuls stay off the 4×-slower fp32 MXU path). ``scale`` rides the
    existing elementwise pass for free — folding the attention scale here
    (on [N, 128] q) saves a per-head pass over the [N, N] fp32 score tile."""
    rot = jnp.dot(x, r, preferred_element_type=jnp.float32).astype(x.dtype)
    out = x * cos + rot * sin
    if scale != 1.0:
        out = out * jnp.asarray(scale, out.dtype)
    return out


def _space_kernel(q_ref, k_ref, v_ref, sin_ref, cos_ref, r_ref, m_ref, o_ref,
                  *, scale, g):
    q = q_ref[0]                                   # [N, 128]
    k = k_ref[0]
    v = v_ref[0]
    sin = sin_ref[...].astype(q.dtype)
    cos = cos_ref[...].astype(q.dtype)
    r = r_ref[...].astype(q.dtype)
    q = _apply_rot(q, sin, cos, r, scale)
    k = _apply_rot(k, sin, cos, r)
    out = jnp.zeros(q.shape, jnp.float32)
    for i in range(g):
        m = m_ref[i:i + 1, :].astype(k.dtype)      # [1, 128]
        s = jax.lax.dot_general(q, k * m, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mx = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = p.sum(axis=-1, keepdims=True)          # [N, 1]
        pv = jnp.dot(p.astype(v.dtype), v * m,
                     preferred_element_type=jnp.float32)
        # denominator on the [N, 128] output rows, not the [N, N] tile
        # (exact: sub-head outputs occupy disjoint lanes)
        out = out + pv / l
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "dim_head", "scale", "interpret"))
def _space_fused(qkv, sin, cos, heads: int, dim_head: int, scale: float,
                 interpret: bool = False):
    """qkv [BF, N, 3·H·dh] → [BF, N, H·dh]."""
    bf, n, _ = qkv.shape
    g = _LANES // dim_head
    npb = heads * dim_head // _LANES               # 128-blocks per third
    sin_t, cos_t = _tile_tables(sin, cos, g)
    r = jnp.asarray(_rot_block(g, dim_head))
    masks = jnp.asarray(_head_masks(g, dim_head))
    return pl.pallas_call(
        functools.partial(_space_kernel, scale=scale, g=g),
        grid=(bf, npb),
        in_specs=[
            pl.BlockSpec((1, n, _LANES), lambda i, h: (i, 0, h)),
            pl.BlockSpec((1, n, _LANES), lambda i, h, P=npb: (i, 0, P + h)),
            pl.BlockSpec((1, n, _LANES),
                         lambda i, h, P=npb: (i, 0, 2 * P + h)),
            pl.BlockSpec((n, _LANES), lambda i, h: (0, 0)),
            pl.BlockSpec((n, _LANES), lambda i, h: (0, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda i, h: (0, 0)),
            pl.BlockSpec((g, _LANES), lambda i, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, _LANES), lambda i, h: (i, 0, h)),
        out_shape=jax.ShapeDtypeStruct((bf, n, heads * dim_head), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, jnp.asarray(sin_t), jnp.asarray(cos_t), r, masks)


def _time_kernel(q_ref, k_ref, v_ref, sin_ref, cos_ref, r_ref, m_ref, o_ref,
                 *, scale, g):
    f = q_ref.shape[1]

    def t(ref):  # [F, BN, W] → [BN, F, W]: F static slice-copies in VMEM
        # (Mosaic batched matmuls need the batch dim at position 0; F is
        # tiny, and an HBM-roundtrip transpose is what this kernel avoids)
        return jnp.stack([ref[0, fi] for fi in range(f)], axis=1)

    q = t(q_ref)                                    # [BN, F, 128]
    k = t(k_ref)
    v = t(v_ref)
    sin = sin_ref[...].astype(q.dtype)[None, :, :]  # [1, F, 128]
    cos = cos_ref[...].astype(q.dtype)[None, :, :]
    r = r_ref[...].astype(q.dtype)
    dn = (((2,), (0,)), ((), ()))
    q = (q * cos + jax.lax.dot_general(
        q, r, dn, preferred_element_type=jnp.float32).astype(q.dtype) * sin
         ) * jnp.asarray(scale, q.dtype)            # scale folded into q
    k = k * cos + jax.lax.dot_general(
        k, r, dn, preferred_element_type=jnp.float32).astype(k.dtype) * sin
    # the g sub-head outputs occupy DISJOINT lane sets (masked v), so
    # accumulating in the output dtype is exact — no fp32 buffer needed
    out = jnp.zeros(q.shape, o_ref.dtype)           # [BN, F, 128]
    bdn = lambda c_l, c_r: ((c_l, c_r), ((0,), (0,)))
    for i in range(g):
        m = m_ref[i:i + 1, :].astype(k.dtype)       # [1, 128]
        # scores over the F axis, batched over the BN patches: [BN, F, F]
        s = jax.lax.dot_general(q, k * m, bdn((2,), (2,)),
                                preferred_element_type=jnp.float32)
        mx = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = p.sum(axis=-1, keepdims=True)           # [BN, F, 1]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v * m, bdn((2,), (1,)),
            preferred_element_type=jnp.float32)
        out = out + (pv / l).astype(o_ref.dtype)
    for fi in range(f):                             # back to [F, BN, 128]
        o_ref[0, fi] = out[:, fi, :]


@functools.partial(jax.jit,
                   static_argnames=("heads", "dim_head", "scale", "block_n",
                                    "interpret"))
def _time_fused(qkv, sin, cos, heads: int, dim_head: int, scale: float,
                block_n: int, interpret: bool = False):
    """qkv [B, F, N, 3·H·dh] → [B, F, N, H·dh]."""
    b, f, n, _ = qkv.shape
    g = _LANES // dim_head
    npb = heads * dim_head // _LANES
    sin_t, cos_t = _tile_tables(sin, cos, g)
    r = jnp.asarray(_rot_block(g, dim_head))
    masks = jnp.asarray(_head_masks(g, dim_head))
    return pl.pallas_call(
        functools.partial(_time_kernel, scale=scale, g=g),
        grid=(b, n // block_n, npb),
        in_specs=[
            pl.BlockSpec((1, f, block_n, _LANES),
                         lambda i, j, h: (i, 0, j, h)),
            pl.BlockSpec((1, f, block_n, _LANES),
                         lambda i, j, h, P=npb: (i, 0, j, P + h)),
            pl.BlockSpec((1, f, block_n, _LANES),
                         lambda i, j, h, P=npb: (i, 0, j, 2 * P + h)),
            pl.BlockSpec((f, _LANES), lambda i, j, h: (0, 0)),
            pl.BlockSpec((f, _LANES), lambda i, j, h: (0, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda i, j, h: (0, 0)),
            pl.BlockSpec((g, _LANES), lambda i, j, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, block_n, _LANES),
                               lambda i, j, h: (i, 0, j, h)),
        out_shape=jax.ShapeDtypeStruct((b, f, n, heads * dim_head), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, jnp.asarray(sin_t), jnp.asarray(cos_t), r, masks)


# --------------------------------------------------------------- dispatch
def _time_block_n(n: int) -> int:
    for bn in (128, 64, 32, 16, 8):
        if n % bn == 0:
            return bn
    return 0


def divided_attention_viable(axis: str, f: int, n: int, heads: int,
                             dim_head: int, rot_dim: int) -> bool:
    """Shape gate for the fused path. Requires full-head-dim rotary (the
    trunk's tables cover all of dh), head groups that tile 128 lanes
    exactly, and clean sequence tiling; everything else takes the reference
    path."""
    if (not _HAS_PALLAS or os.environ.get("MODITALKER_NO_FLASH_ATTN")
            or os.environ.get("MODITALKER_NO_DIVIDED_FUSED")
            or rot_dim != dim_head or dim_head > _LANES
            or _LANES % dim_head != 0
            or (heads * dim_head) % _LANES != 0):
        return False
    if axis == "space":
        # full-row softmax: fp32 [N, N] score tile must sit in VMEM
        return n % 128 == 0 and 256 <= n <= 2048
    if axis == "time":
        return f % 8 == 0 and f <= 32 and _time_block_n(n) > 0
    return False


def divided_attention(qkv, sin, cos, axis: str, heads: int, dim_head: int,
                      scale: float, interpret: bool = False):
    """Fused divided attention on packed qkv [B, F, N, 3·H·dh].

    Dispatches to the Pallas kernels on TPU at viable shapes (XLA reference
    everywhere else; backward always recomputes via the reference path).
    Returns [B, F, N, H·dh].
    """
    b, f, n, _ = qkv.shape
    sin = np.asarray(sin)
    cos = np.asarray(cos)
    if not divided_attention_viable(axis, f, n, heads, dim_head,
                                    sin.shape[-1]):
        return divided_attention_reference(qkv, sin, cos, axis, heads,
                                           dim_head, scale)

    sc = float(scale)

    def pallas_fwd(t):
        if axis == "space":
            out = _space_fused(t.reshape(b * f, n, t.shape[-1]), sin, cos,
                               heads, dim_head, sc, interpret)
            return out.reshape(b, f, n, heads * dim_head)
        return _time_fused(t, sin, cos, heads, dim_head, sc,
                           _time_block_n(n), interpret)

    def ref_plain(t):
        return divided_attention_reference(t, sin, cos, axis, heads,
                                           dim_head, sc, use_flash=False)

    @jax.custom_vjp
    def fused(t):
        return pallas_fwd(t)

    def fwd(t):
        return pallas_fwd(t), (t,)

    def bwd(res, g):
        (t,) = res
        _, vjp = jax.vjp(ref_plain, t)
        return vjp(g)

    fused.defvjp(fwd, bwd)

    # analytic FLOPs for the MFU ledger (cost_analysis can't see inside the
    # custom call): scores+pv = 4·seq²·dh per (batch, head) sequence, plus
    # the two ±1 rotary matmuls = 4·tokens·dh² per head.
    seq = n if axis == "space" else f
    seqs_per_head = b * f * n // seq
    _ledger_record(heads * (4.0 * seqs_per_head * seq * seq * dim_head
                            + 4.0 * b * f * n * dim_head * dim_head))
    if interpret:
        return fused(qkv)
    return jax.lax.platform_dependent(qkv, tpu=fused, default=ref_plain)
