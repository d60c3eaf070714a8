#!/bin/bash
# One-shot TPU measurement battery: run everything that needs the real chip
# in one go (the axon tunnel comes and goes — waste no window).
#   bash tools/hw_window.sh [outdir]
# Produces, under $outdir (default /tmp/hw_r5):
#   bench.json            headline bench.py line (median-of-4 + spread)
#   profile_whole.json    prefix-delta stage ledger (the trustworthy one)
#   probe_b.json          program-B back-to-back dispatch attribution
#   probe_exact.log       Mosaic-vs-XLA op exactness (incl. dot probes)
#   configs.json          per-config BASELINE rows (also merged into tools/bench_configs.json)
#   e2e_model.json        link model + pipelined overlap efficiency
#   smoke.log             all encode paths on hardware
# NOTE (memory: 1 vCPU host): do not run the pytest suite concurrently.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_r5}
mkdir -p "$OUT"

echo "=== probe ==="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

echo "=== op exactness (incl. dot probes) ==="
timeout 1800 python tools/probe_op_exactness.py 2>&1 | tee "$OUT/probe_exact.log"

echo "=== prefix-delta whole-program ledger ==="
timeout 3600 python tools/profile_whole.py --json "$OUT/profile_whole.json" 2>&1 | tail -25

echo "=== program-B dispatch attribution ==="
timeout 2400 python tools/probe_b_dispatch.py --json "$OUT/probe_b.json" 2>&1 | tail -20

echo "=== bench.py ==="
timeout 1800 python bench.py 2>"$OUT/bench.err" | tee "$OUT/bench.json"

echo "=== smoke (all paths on hardware) ==="
timeout 2400 python tools/smoke_tpu.py > "$OUT/smoke.log" 2>&1
tail -15 "$OUT/smoke.log"

echo "=== bench_configs (TPU rows) ==="
timeout 3600 python tools/bench_configs.py 2>"$OUT/configs.err" | tee "$OUT/configs.json"

echo "=== e2e link model + overlap ==="
timeout 3600 python tools/e2e_model.py --json "$OUT/e2e_model.json" 2>&1 | tail -15

echo "done -> $OUT"
