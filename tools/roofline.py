"""Empirical device roofline + packed-kernel v3 attribution (round 4).

Measures, on the attached chip, chained inside ONE jitted fori_loop each:
  1. dense bf16 matmul rates (the friendliest op the MXU will ever see),
     under both a scalar-dependency chain (upper bound — XLA may compute
     only what feeds the chain; invalid above ~4096) and a full-output
     dependency chain (lower bound — adds an HBM round-trip per iter);
  2. the packed joint-attention kernel (ops/pallas/packed_attention.py)
     vs its mxu-only skeleton (softmax replaced by a cast) — attribution
     of matmul vs VPU time;
  3. XLA's native dh=16 multi-head attention (the fallback path the
     kernel replaces).

Run: cd /tmp && python -c "import sys; sys.path[:0] = ['/root/repo']; \
     import tools.roofline" — or python tools/roofline.py from a cwd
whose PYTHONPATH does not shadow the axon plugin registration (setting
PYTHONPATH=/root/repo broke backend discovery in round 4; a sys.path
insert does not).

Round-4 measurements recorded in DESIGN.md §7 "device roofline
attribution".
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np


def _timed_loop(make_body, x, iters):
    import jax

    @jax.jit
    def loop(t):
        return jax.lax.fori_loop(0, iters, make_body, t)

    out = loop(x)
    np.asarray(out.reshape(-1)[:2])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(out)
        np.asarray(out.reshape(-1)[:2])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def scalar_chain(fn):
    """Next input gated on one output element. Upper-bound hazard: XLA can
    compute only the rows feeding the chain for plain dots (measured: a
    'phantom' 591 TF/s at 8192³). Fine for opaque pallas_calls."""
    import jax.numpy as jnp

    def body(_, tt):
        out = fn(tt)
        m = (1 + 0 * out.reshape(-1)[0].astype(jnp.float32)).astype(tt.dtype)
        return tt * m
    return body


def full_chain(fn):
    """Next input is a scaled copy of the whole output — nothing can be
    elided, but each iteration pays a full HBM materialization."""
    import jax.numpy as jnp

    def body(_, tt):
        out = fn(tt)
        return (out.astype(jnp.float32) * (1.0 / out.shape[-1])
                ).astype(tt.dtype)
    return body


def dense_rates(iters=10):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    rows = []
    for n, acc in ((4096, jnp.float32), (4096, jnp.bfloat16)):
        m = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)

        def mm(t, acc=acc):
            return jax.lax.dot(t, t, preferred_element_type=acc)

        fl = 2.0 * n ** 3
        t_sc = _timed_loop(scalar_chain(lambda t: mm(t).astype(jnp.bfloat16)),
                           m, iters)
        t_fd = _timed_loop(full_chain(mm), m, iters)
        rows.append((n, acc.__name__, fl / t_sc / 1e12, fl / t_fd / 1e12))
        print(f"dense bf16 {n}^3 -> {acc.__name__}: scalar-chain "
              f"{fl/t_sc/1e12:.1f} TF/s  full-chain {fl/t_fd/1e12:.1f} TF/s",
              flush=True)
    return rows


def packed_attribution(iters=50):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from moditalker_tpu.ops.pallas import packed_attention as pa

    b, l, c, h = 4, 2048, 128, 8
    blk = pa._block_q(l, c)
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(b, l, 3 * c)), jnp.bfloat16)
    scale = 16 ** -0.5

    def mxu_only(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, heads):
        # v3 skeleton: both monolithic matmuls, softmax replaced by a cast.
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        bq, cc = q.shape
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        masks = m_ref[...].astype(qs.dtype)
        qm = jnp.concatenate(
            [qs * masks[hh:hh + 1] for hh in range(heads)], axis=0)
        s = jax.lax.dot_general(qm, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        pv = jnp.dot((s * 1e-3).astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
        out = jnp.zeros((bq, cc), jnp.float32)
        for hh in range(heads):
            out = out + pv[hh * bq:(hh + 1) * bq] * masks[hh:hh + 1]
        o_ref[0] = out.astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=())
    def run_mxu(t):
        masks = jnp.asarray(pa._head_masks(h, c))
        return pl.pallas_call(
            functools.partial(mxu_only, scale=scale, heads=h),
            grid=(b, l // blk),
            in_specs=[
                pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 1)),
                pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 2)),
                pl.BlockSpec((h, c), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b, l, c), t.dtype),
        )(t, t, t, masks)

    def mha_xla(t):
        # native dh=16 multi-head attention, the packed kernel's fallback
        sc = jax.lax.dot_general(
            t, t, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(sc, axis=-1)
        return jax.lax.dot_general(
            p.astype(t.dtype), t, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32).astype(t.dtype)

    # packed formulation: each of the h heads contracts over the FULL
    # packed channel axis c (that is the 128-lane redundancy), two matmuls
    raw = 4.0 * b * h * l * l * c
    useful = raw / (c // 16)           # dh=16 useful FLOPs

    t_full = _timed_loop(
        scalar_chain(lambda t: pa._packed_fused(t, h, scale, blk)), qkv,
        iters)
    t_mxu = _timed_loop(scalar_chain(run_mxu), qkv, iters)
    q4 = jnp.asarray(rng.normal(size=(b, h, l, 16)), jnp.bfloat16)
    t_mha = _timed_loop(scalar_chain(mha_xla), q4, iters)

    print(f"packed v3 full:     {t_full*1e6:.0f} us  "
          f"({raw/t_full/1e12:.1f} raw TF/s, "
          f"{useful/t_full/1e12:.1f} useful TF/s)", flush=True)
    print(f"packed v3 mxu-only: {t_mxu*1e6:.0f} us  "
          f"(softmax hidden if ~= full)", flush=True)
    print(f"XLA dh=16 MHA:      {t_mha*1e6:.0f} us  "
          f"({useful/t_mha/1e12:.1f} useful TF/s)", flush=True)


def main():
    print("devices:", end=" ")
    import jax
    print(jax.devices(), flush=True)
    dense_rates()
    packed_attribution()


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
