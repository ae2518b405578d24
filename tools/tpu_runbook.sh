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

echo "all outputs in $OUT"
