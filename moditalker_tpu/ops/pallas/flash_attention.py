"""Fused attention kernel for TPU (Pallas).

One pallas_call computes softmax(q·kᵀ·scale)·v entirely in VMEM for a
q-block, avoiding HBM round-trips for the [N, N] score matrix. Shapes in
this model family are short-sequence (N ≤ 2048: triplane joint attention
2048, TimeSformer space 1024 / time 16, quant pools ≤ 33) with head dim
64 — K/V for a whole sequence fit comfortably in VMEM, so the kernel grids
over (batch·heads, q-blocks) and loops K-blocks with an online softmax.

``fused_attention`` falls back to the XLA einsum path for ragged shapes or
non-TPU backends. Parity with ``ops.attention.sdpa`` is covered by
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..attention import sdpa as xla_sdpa

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k):
    # matmuls stay in the input dtype (bf16 on TPU) with fp32 accumulation —
    # fp32 MXU matmuls are ~4x slower and were the original kernel's downfall
    q = q_ref[0]                                      # [BQ, D]
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)  # fold scale into q
    n = k_ref.shape[1]
    num_kb = n // block_k

    bq, d = q.shape
    m_i = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    def body(kb, carry):
        m_i, l_i, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m_i, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m_i, l_i, acc = jax.lax.fori_loop(0, num_kb, body, (m_i, l_i, acc))
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused(q, k, v, scale: float, interpret: bool = False):
    b, nq, d = q.shape
    nk = k.shape[1]
    block_q = min(128, max(8, nq))
    block_k = min(128, max(8, nk))
    nq_p = ((nq + block_q - 1) // block_q) * block_q
    nk_p = ((nk + block_k - 1) // block_k) * block_k
    qp = _pad_to(q, nq_p, 1)
    kp = _pad_to(k, nk_p, 1)
    vp = _pad_to(v, nk_p, 1)
    if nk_p != nk:
        # mask padded keys by pushing their scores to -inf via a huge
        # negative value channel trick: zero keys give score 0, which is
        # wrong — instead bias via concatenating handled below.
        raise ValueError("nk must be a multiple of the k block")

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, block_k=block_k),
        grid=(b, nq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, nk_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, nk_p, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nq_p, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :nq]


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    # Whole-KV-resident variant: K/V for the full sequence sit in VMEM, so
    # the softmax is a plain full-row one (no online max/sum rescaling). The
    # [BQ, N] score tile lives and dies in VMEM — the XLA path's dominant
    # HBM traffic (the [N, N] score tensor) never exists.
    # VPU economy: scale folded into q ([BQ, D], not the [BQ, N] score
    # tile); softmax denominator divides the [BQ, D] output rows, not the
    # [BQ, N] probability tile (exact: (p/l) @ v == (p @ v) / l row-wise).
    q = q_ref[0]                                       # [BQ, D]
    k = k_ref[0]                                       # [N, D]
    v = v_ref[0]
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)                  # [BQ, 1]
    pv = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (pv / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _onepass(q, k, v, scale: float, interpret: bool = False):
    b, n, d = q.shape
    # Score tile is [blk_q, N] fp32; keep it ≤ 8 MB of VMEM.
    blk_q = min(1024, max(256, (8 * 1024 * 1024) // (4 * n)))
    while n % blk_q:
        blk_q //= 2
    return pl.pallas_call(
        functools.partial(_onepass_kernel, scale=scale),
        grid=(b, n // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _tiny_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    # Tiny-L batched attention (e.g. TimeSformer time attention: L=16 over
    # ~100k independent sequences). XLA's batched matmul runs this at ~2
    # TF/s; one VMEM-resident chunk of sequences per grid step avoids the
    # HBM round-trips between the two matmuls and the softmax.
    qq = q_ref[...]                                    # [C, L, D]
    kk = k_ref[...]
    vv = v_ref[...]
    qs = (qq.astype(jnp.float32) * scale).astype(qq.dtype)
    s = jax.lax.dot_general(qs, kk, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)                  # [C, L, 1]
    pv = jax.lax.dot_general(
        p.astype(vv.dtype), vv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = (pv / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _tiny(q, k, v, scale: float, interpret: bool = False):
    b, n, d = q.shape
    chunk = 256 if b % 256 == 0 else 128
    return pl.pallas_call(
        functools.partial(_tiny_kernel, scale=scale),
        grid=(b // chunk,),
        in_specs=[pl.BlockSpec((chunk, n, d), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((chunk, n, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def tiny_attention_viable(b: int, nq: int, nk: int, d: int) -> bool:
    """Shapes where the tiny-L chunk kernel beats XLA on TPU (measured on
    v5e at [98304, 16, 64]: 7.76 → 5.16 ms). Ragged shapes are excluded:
    sublane/lane padding both wastes the VMEM chunk budget (the quant-pool
    [·,17,48] shape OOMed scoped vmem) and erases the win."""
    return (_HAS_PALLAS and nq == nk and nq <= 32 and nq % 8 == 0
            and b >= 4096 and b % 128 == 0 and d % 64 == 0 and d <= 128)


def tiny_attention(q, k, v, scale: float, interpret: bool = False):
    """Chunked VMEM attention for [B, L, D] with tiny L (folded batch)."""
    return _tiny(q, k, v, float(scale), interpret)


def onepass_attention_viable(nq: int, nk: int, d: int) -> bool:
    """Shapes where the single-pass kernel beats XLA on TPU (measured on v5e:
    joint-attn [32,2048,16] 1549→658 us, TimeSformer space [384,1024,64]
    3841→1741 us; at N=512 it's a wash, so the floor is N=1024)."""
    return (_HAS_PALLAS and nq == nk and nq >= 1024 and nq % 256 == 0
            and d % 8 == 0 and d <= 128)


def onepass_attention(q, k, v, scale: float, interpret: bool = False):
    """Single-pass flash attention for [B, N, D] blocks (fold heads into B).

    Requires ``onepass_attention_viable(nq, nk, d)``; no mask support.
    """
    return _onepass(q, k, v, float(scale), interpret)


def fused_attention(q, k, v, scale: float | None = None,
                    interpret: bool = False):
    """Drop-in for ``sdpa`` on [B, N, D] (fold heads into B first).

    Falls back to the XLA path when pallas is unavailable or the key length
    doesn't tile cleanly.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    nk = k.shape[1]
    on_tpu = jax.default_backend() == "tpu" or interpret
    tiles_ok = nk % 8 == 0 and q.shape[-1] % 8 == 0
    block_k = min(128, max(8, nk))
    if (not _HAS_PALLAS or not on_tpu or not tiles_ok
            or nk % block_k != 0):
        return xla_sdpa(q, k, v, scale=scale)
    return _fused(q, k, v, float(scale), interpret)
