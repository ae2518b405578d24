"""Controlled same-process A/B: packed-attention kernel v1 (k/v masks) vs
the CURRENT shipped kernel (v3: stacked monolithic matmuls — see
packed_attention.py). Interleaved reps so relay drift affects both arms
equally. `diag` mode carries the v2-era per-head-loop attribution bodies;
tools/roofline.py has the v3 attribution."""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from moditalker_tpu.ops.pallas import packed_attention as pa

    def _v1_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, heads):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        out = jnp.zeros(q.shape, o_ref.dtype)
        for h in range(heads):
            m = m_ref[h:h + 1, :].astype(k.dtype)
            s = jax.lax.dot_general(qs, k * m, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            mx = s.max(axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = p.sum(axis=-1, keepdims=True)
            pv = jnp.dot(p.astype(v.dtype), v * m,
                         preferred_element_type=jnp.float32)
            out = out + (pv / l).astype(o_ref.dtype)
        o_ref[0] = out

    @functools.partial(jax.jit, static_argnames=("heads", "scale", "block_q"))
    def v1(qkv, heads, scale, block_q):
        b, l, c3 = qkv.shape
        c = c3 // 3
        masks = jnp.asarray(pa._head_masks(heads, c))
        return pl.pallas_call(
            functools.partial(_v1_kernel, scale=scale, heads=heads),
            grid=(b, l // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 1)),
                pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 2)),
                pl.BlockSpec((heads, c), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b, l, c), qkv.dtype),
        )(qkv, qkv, qkv, masks)

    rng = np.random.default_rng(0)
    b, l, c, h = 4, 2048, 128, 8
    blk = pa._block_q(l, c)
    qkv = jnp.asarray(rng.normal(size=(b, l, 3 * c)), jnp.bfloat16)
    scale = 16 ** -0.5

    f1 = jax.jit(lambda t: v1(t, h, scale, blk))
    f2 = jax.jit(lambda t: pa._packed_fused(t, h, scale, blk))

    # parity first
    o1 = np.asarray(f1(qkv), np.float32)
    o2 = np.asarray(f2(qkv), np.float32)
    print("maxdiff v1-v2:", np.abs(o1 - o2).max(), file=sys.stderr)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    def make_loop(f):
        # K data-dependently chained kernel calls inside ONE jitted program:
        # eager chaining ops over the relay cost ~10-30 ms each and swamp a
        # ~1.6 ms kernel (measured round 4 — tools/bench_kernels.py's eager
        # chain inflated micro numbers 10-60x).
        @jax.jit
        def loop(t):
            def body(_, tt):
                out = f(tt)
                m = (1 + 0 * out.reshape(-1)[0]).astype(tt.dtype)
                return tt * m
            return jax.lax.fori_loop(0, iters, body, t)
        return loop

    l1, l2 = make_loop(f1), make_loop(f2)

    def run(lf, t):
        out = lf(t)
        np.asarray(out[0, 0, :2])
        t0 = time.perf_counter()
        out = lf(out)
        np.asarray(out[0, 0, :2])
        return (time.perf_counter() - t0) / iters

    r1, r2 = [], []
    for rep in range(4):
        r1.append(run(l1, qkv))
        r2.append(run(l2, qkv))
    # useful FLOPs: 4·b·h·l²·dh
    fl = 4.0 * b * h * l * l * (c // h)
    t1, t2 = min(r1), min(r2)
    print(f"v1 (k/v masks):      {t1*1e6:.0f} us  "
          f"({fl/t1/1e12:.1f} useful TF/s)  reps={[f'{x*1e6:.0f}' for x in r1]}")
    print(f"v2 (q/out+pipeline): {t2*1e6:.0f} us  "
          f"({fl/t2/1e12:.1f} useful TF/s)  reps={[f'{x*1e6:.0f}' for x in r2]}")




def diagnose():
    """MXU/VPU attribution: time kernel variants with softmax or the second
    matmul removed. Run: python tools/ab_packed.py diag [iters]."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from moditalker_tpu.ops.pallas import packed_attention as pa

    def _mk(body):
        @functools.partial(jax.jit, static_argnames=("heads", "scale",
                                                     "block_q"))
        def run(qkv, heads, scale, block_q):
            b, l, c3 = qkv.shape
            c = c3 // 3
            masks = jnp.asarray(pa._head_masks(heads, c))
            return pl.pallas_call(
                functools.partial(body, scale=scale, heads=heads),
                grid=(b, l // block_q),
                in_specs=[
                    pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0)),
                    pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 1)),
                    pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 2)),
                    pl.BlockSpec((heads, c), lambda i, j: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, block_q, c),
                                       lambda i, j: (i, j, 0)),
                out_shape=jax.ShapeDtypeStruct((b, l, c), qkv.dtype),
            )(qkv, qkv, qkv, masks)
        return run

    def mxu_only(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, heads):
        # both matmuls, softmax replaced by a single cast (lower bound on
        # achievable time if ALL softmax VPU work were hidden)
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        out = jnp.zeros(q.shape, jnp.float32)
        for h in range(heads):
            m = m_ref[h:h + 1, :]
            qm = qs * m.astype(qs.dtype)
            s = jax.lax.dot_general(qm, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            pv = jnp.dot(s.astype(v.dtype) * jnp.asarray(1e-3, v.dtype), v,
                         preferred_element_type=jnp.float32)
            out = out + pv * m
        o_ref[0] = out.astype(o_ref.dtype)

    def no_pv(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, heads):
        # score matmul + full softmax, second matmul removed: MXU half +
        # all VPU work
        q = q_ref[0]
        k = k_ref[0]
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        out = jnp.zeros(q.shape, jnp.float32)
        for h in range(heads):
            m = m_ref[h:h + 1, :]
            qm = qs * m.astype(qs.dtype)
            s = jax.lax.dot_general(qm, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            mx = s.max(axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = p.sum(axis=-1, keepdims=True)
            out = out + (p[:, :128] / l) * m
        o_ref[0] = out.astype(o_ref.dtype)

    rng = np.random.default_rng(0)
    b, l, c, h = 4, 2048, 128, 8
    blk = pa._block_q(l, c)
    qkv = jnp.asarray(rng.normal(size=(b, l, 3 * c)), jnp.bfloat16)
    scale = 16 ** -0.5
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    def timed(f):
        @jax.jit
        def loop(t):
            def body(_, tt):
                out = f(tt, h, scale, blk)
                m = (1 + 0 * out.reshape(-1)[0]).astype(tt.dtype)
                return tt * m
            return jax.lax.fori_loop(0, iters, body, t)

        out = loop(qkv)
        np.asarray(out[0, 0, :2])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(out)
            np.asarray(out[0, 0, :2])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_full = timed(lambda t, hh, sc, bq: pa._packed_fused(t, hh, sc, bq))
    t_mxu = timed(_mk(mxu_only))
    t_sfm = timed(_mk(no_pv))
    print(f"full kernel:      {t_full*1e6:.0f} us")
    print(f"mxu-only (2 mm):  {t_mxu*1e6:.0f} us")
    print(f"score+softmax:    {t_sfm*1e6:.0f} us")




if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "diag":
        diagnose()
    else:
        main()
