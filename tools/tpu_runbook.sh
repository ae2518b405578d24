#!/bin/bash
# One-shot TPU measurement pass (run when the axon relay is up; claims the
# single chip — never run two TPU jobs at once). Captures every pending A/B
# into /tmp/tpu_runbook/.
set -u
OUT=${1:-/tmp/tpu_runbook}
mkdir -p "$OUT"
cd /root/repo

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name ==="
  timeout 1800 "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  echo "rc=$? (tail):"; tail -5 "$OUT/$name.out"
}

# Ordered by importance (in case the relay window is short):
# 1. headline bench (default gate)
run bench python bench.py

# 2. headline bench with the lowered packed gate (keep if faster)
run bench_minl256 env MODITALKER_PACKED_MIN_L=256 python bench.py

# 3. e2e with align-phase breakdown (transfer-lean preprocessing)
run bench_e2e python bench_e2e.py

# 4. kernel A/B (new VPU-lean kernels vs DESIGN.md's recorded numbers)
run kernels python tools/bench_kernels.py --unet

# 5. packed-attention L-floor A/B for the ds=1 ytxt attn2d shape
run kernels_minl256 env MODITALKER_PACKED_MIN_L=256 \
    python tools/bench_kernels.py

# 6. user-facing CLI throughput vs bench.py (VERDICT r2 weak #5)
run cli_sample python tools/bench_cli_sample.py --batch 4

# 7. device roofline + packed-kernel attribution (round 4)
run roofline python tools/roofline.py

# 8. golden record/check round-trip at REAL model configs (VERDICT r3 #9):
#    synthetic weights, full-size AToM horizon + MToV window; proves the
#    harness and the GroupNorm one-pass-variance guard at production
#    activation scales, and that record→check is bit-deterministic on chip.
run golden_full_record python -m moditalker_tpu.cli golden --mode record \
    --golden "$OUT/goldens_full.npz"
run golden_full_check python -m moditalker_tpu.cli golden --mode check \
    --golden "$OUT/goldens_full.npz"

echo "all outputs in $OUT"
