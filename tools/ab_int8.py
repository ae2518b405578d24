"""int8 vs bf16 A/B at the eval nets' hot shapes (VERDICT r4 #4).

v5e's MXU does s8×s8→s32 at 2× the bf16 FLOP rate (394 vs 197 TOPS peak),
so the align trunks (S3FD/FAN/ReconNet — regressor inputs with documented
tolerance headroom) and the AE extract are candidates for an int8 eval
mode. Before building any plumbing, this measures the REAL candidate
program on chip: dynamic per-tensor activation quant (amax → scale → round
→ cast, paid every layer) + s8 conv/dot with int32 accumulation +
per-output-channel dequant, against the shipped bf16 arm.

Shapes: fused_align.py chunk=64 programs (S3FD trunk convs at 256² input,
FAN hourglass convs at 64², ReconNet bottleneck 3×3s at 224² input) and
the AE extract qkv projection.

Timing per tools/ab_packed.py: K data-dependently chained calls inside one
jitted fori_loop; interleaved reps so relay drift hits both arms equally.

Run: python tools/ab_int8.py [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

CASES = [
    # name, kind, x-shape (NHWC / [M,K]), w-shape (HWIO / [K,N])
    ("s3fd conv2_2 256²in", "conv", (64, 128, 128, 128), (3, 3, 128, 128)),
    ("s3fd conv3_3", "conv", (64, 64, 64, 256), (3, 3, 256, 256)),
    ("fan hourglass 3×3", "conv", (64, 64, 64, 256), (3, 3, 256, 256 // 2)),
    ("recon layer2 3×3", "conv", (64, 28, 28, 128), (3, 3, 128, 128)),
    ("recon layer3 3×3", "conv", (64, 14, 14, 256), (3, 3, 256, 256)),
    ("ae qkv dense", "dot", (16384, 384), (384, 1152)),
]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rng = np.random.default_rng(0)

    dn = ("NHWC", "HWIO", "NHWC")

    def mk_ops(kind, wshape):
        w32 = rng.normal(size=wshape).astype(np.float32) / np.sqrt(
            np.prod(wshape[:-1]))
        w_bf = jnp.asarray(w32, jnp.bfloat16)
        # static per-output-channel symmetric weight quant
        oc_axes = tuple(range(w32.ndim - 1))
        wmax = np.abs(w32).max(axis=oc_axes, keepdims=True)
        wscale = (wmax / 127.0).astype(np.float32)
        w_q = jnp.asarray(np.rint(w32 / wscale).clip(-127, 127), jnp.int8)
        wscale = jnp.asarray(wscale.reshape(-1), jnp.float32)

        if kind == "conv":
            def f_bf16(x):
                return lax.conv_general_dilated(
                    x, w_bf, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.float32)

            def f_int8(x):
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
                s = amax / 127.0
                xq = jnp.clip(jnp.rint(x.astype(jnp.float32) / s),
                              -127, 127).astype(jnp.int8)
                yq = lax.conv_general_dilated(
                    xq, w_q, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                return yq.astype(jnp.float32) * (s * wscale)
        else:
            def f_bf16(x):
                return jnp.dot(x, w_bf, preferred_element_type=jnp.float32)

            def f_int8(x):
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
                s = amax / 127.0
                xq = jnp.clip(jnp.rint(x.astype(jnp.float32) / s),
                              -127, 127).astype(jnp.int8)
                yq = lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                return yq.astype(jnp.float32) * (s * wscale)
        return f_bf16, f_int8

    def make_loop(f, out_to_in):
        @jax.jit
        def loop(t):
            def body(_, tt):
                out = f(tt)
                # data-dependent chain: scalar of out gates the next input
                m = (1 + 0 * out.reshape(-1)[0]).astype(tt.dtype)
                return (out_to_in(out) * m).astype(tt.dtype)
            return lax.fori_loop(0, iters, body, t)
        return loop

    for name, kind, xshape, wshape in CASES:
        x = jnp.asarray(rng.normal(size=xshape), jnp.bfloat16)
        f_bf16, f_int8 = mk_ops(kind, wshape)
        cin, cout = wshape[-2], wshape[-1]
        if cin == cout:
            out_to_in = lambda o: o
        else:
            reps = int(np.ceil(cin / cout))
            out_to_in = lambda o, reps=reps, cin=cin: jnp.tile(
                o, (1,) * (o.ndim - 1) + (reps,))[..., :cin]

        l_bf, l_q = make_loop(f_bf16, out_to_in), make_loop(f_int8, out_to_in)

        # parity sanity (quant error should be small-ish, not garbage)
        yb = np.asarray(f_bf16(x), np.float32)
        yq = np.asarray(f_int8(x), np.float32)
        rel = np.abs(yb - yq).max() / (np.abs(yb).max() + 1e-9)

        def run(lf):
            out = lf(x)
            np.asarray(out.reshape(-1)[:2])       # warm beyond compile
            t0 = time.perf_counter()
            out = lf(x)
            np.asarray(out.reshape(-1)[:2])
            return (time.perf_counter() - t0) / iters

        rb, rq = [], []
        for _ in range(3):
            rb.append(run(l_bf))
            rq.append(run(l_q))
        tb, tq = min(rb), min(rq)
        if kind == "conv":
            n, h, w_, _ = xshape
            fl = 2.0 * n * h * w_ * wshape[0] * wshape[1] * cin * cout
        else:
            fl = 2.0 * xshape[0] * cin * cout
        print(f"{name:22s} bf16 {tb * 1e3:7.2f} ms ({fl / tb / 1e12:5.1f} "
              f"TF/s) | int8(+dyn quant) {tq * 1e3:7.2f} ms "
              f"({fl / tq / 1e12:5.1f} TOP/s) | speedup {tb / tq:4.2f}x "
              f"| relerr {rel:.3e}")


if __name__ == "__main__":
    main()
