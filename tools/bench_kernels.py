"""Kernel microbench — times the Pallas attention kernels and one UNet step
on the attached TPU chip. Used to A/B kernel changes against the numbers
recorded in DESIGN.md §7; not part of the driver contract.

Usage: python tools/bench_kernels.py [--iters N]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def timeit(fn, args, iters, chain=None):
    """Median of `iters` data-dependently chained dispatches."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]  # warm + sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        a = args
        for _ in range(iters):
            out = fn(*a)
            if chain is not None:
                a = chain(out, a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def chain_first(out, args):
    leaf = jax.tree_util.tree_leaves(out)[0]
    m = (1 + 0 * leaf.reshape(-1)[0]).astype(args[0].dtype)
    return (args[0] * m,) + tuple(args[1:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--unet", action="store_true", help="also time a UNet step")
    args = ap.parse_args()
    it = args.iters

    global jax
    import jax
    import jax.numpy as jnp

    from moditalker_tpu.ops.pallas import divided_attention as da
    from moditalker_tpu.ops.pallas import flash_attention as fa
    from moditalker_tpu.ops.pallas import packed_attention as pa

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape), bf)

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)

    # 1. UNet joint attention, packed-head kernel: [B=4, L=2048, C=128] h=8
    qkv = mk(4, 2048, 3 * 128)
    f = jax.jit(lambda t: pa.packed_attention(t, 8, 16 ** -0.5))
    dt = timeit(f, (qkv,), it, chain_first)
    print(f"packed_attention [4,2048,128]h8: {dt*1e6:.0f} us")

    # 1b. ds=1 ytxt attn2d shape via packed kernel vs head-split reference
    qkv5 = mk(8, 512, 3 * 128)
    f = jax.jit(lambda t: pa._packed_fused(t, 8, 16 ** -0.5,
                                           pa._block_q(512, 128)))
    dt = timeit(f, (qkv5,), it, chain_first)
    print(f"packed_attention [8,512,128]h8 (forced): {dt*1e6:.0f} us")
    f = jax.jit(lambda t: pa.packed_attention_reference(t, 8, 16 ** -0.5,
                                                        use_flash=False))
    dt = timeit(f, (qkv5,), it, chain_first)
    print(f"einsum reference [8,512,128]h8: {dt*1e6:.0f} us")

    # 2. onepass flash: joint attn folded heads [32, 2048, 16]
    q = mk(32, 2048, 16)
    f = jax.jit(lambda q: fa.onepass_attention(q, q, q, 16 ** -0.5))
    dt = timeit(f, (q,), it, chain_first)
    print(f"onepass [32,2048,16]: {dt*1e6:.0f} us")

    # 3. onepass flash: TimeSformer space shape [384, 1024, 64]
    q = mk(384, 1024, 64)
    f = jax.jit(lambda q: fa.onepass_attention(q, q, q, 64 ** -0.5))
    dt = timeit(f, (q,), it, chain_first)
    print(f"onepass [384,1024,64]: {dt*1e6:.0f} us")

    # 4. tiny kernel: time attention [98304, 16, 64]
    q = mk(98304, 16, 64)
    f = jax.jit(lambda q: fa.tiny_attention(q, q, q, 64 ** -0.5))
    dt = timeit(f, (q,), it, chain_first)
    print(f"tiny [98304,16,64]: {dt*1e6:.0f} us")

    # 5. divided space kernel: [B=4, F=16, N=1024, 3*384] h=6 dh=64
    n, h, dh = 1024, 6, 64
    qkv = mk(4, 16, n, 3 * h * dh)
    sin = np.asarray(rng.normal(size=(n, dh)), np.float32)
    cos = np.asarray(rng.normal(size=(n, dh)), np.float32)
    f = jax.jit(lambda t: da.divided_attention(
        t, sin, cos, "space", h, dh, dh ** -0.5))
    dt = timeit(f, (qkv,), it, chain_first)
    print(f"divided space [4,16,1024,{3*h*dh}]: {dt*1e6:.0f} us")

    # 6. divided time kernel
    sin_t = np.asarray(rng.normal(size=(16, dh)), np.float32)
    cos_t = np.asarray(rng.normal(size=(16, dh)), np.float32)
    f = jax.jit(lambda t: da.divided_attention(
        t, sin_t, cos_t, "time", h, dh, dh ** -0.5))
    dt = timeit(f, (qkv,), it, chain_first)
    print(f"divided time  [4,16,1024,{3*h*dh}]: {dt*1e6:.0f} us")

    if args.unet:
        from moditalker_tpu.config import MtovUNetConfig
        from moditalker_tpu.models.mtov import TriplaneUNet

        cfg = MtovUNetConfig()
        unet = TriplaneUNet(cfg, dtype=bf)
        L = cfg.latent_res ** 2 + 2 * cfg.latent_t * cfg.latent_res
        x = mk(4, 4, L).astype(jnp.float32)
        cond = mk(4, 8, L).astype(jnp.float32)
        ic = mk(4, 4, L).astype(jnp.float32)
        t = jnp.full((4,), 500, jnp.int32)
        params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, cond, ic, t)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, params)
        f = jax.jit(lambda p, x, c, i, t: unet.apply(p, x, c, i, t))
        dt = timeit(f, (params, x, cond, ic, t), it,
                    lambda out, a: (a[0],
                                    a[1] * (1 + 0 * out.reshape(-1)[0]
                                            ).astype(a[1].dtype)) + a[2:])
        print(f"UNet step B=4: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
