#!/bin/bash
# One-shot TPU measurement battery: run everything that needs the real chip
# in one go (the axon tunnel comes and goes — waste no window).
#   bash tools/hw_window.sh [outdir]
# Produces, under $outdir (default /tmp/hw_r2):
#   bench.json            headline bench.py line
#   configs.json          per-config BASELINE rows (also merged into tools/bench_configs.json)
#   analysis.log          program-A stage decomposition (bench_analysis.py)
#   microbench.log        kernel slope timings (microbench.py)
#   smoke.log             all encode paths on hardware
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_r2}
mkdir -p "$OUT"

echo "=== probe ==="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

echo "=== bench.py ==="
timeout 1800 python bench.py 2>"$OUT/bench.err" | tee "$OUT/bench.json"

echo "=== bench_configs (TPU rows) ==="
timeout 3600 python tools/bench_configs.py 2>"$OUT/configs.err" | tee "$OUT/configs.json"

echo "=== stage decomposition ==="
timeout 1800 python tools/bench_analysis.py > "$OUT/analysis.log" 2>&1
tail -30 "$OUT/analysis.log"

echo "=== device loop ==="
timeout 1800 python tools/bench_device_loop.py > "$OUT/device_loop.log" 2>&1
tail -10 "$OUT/device_loop.log"

echo "=== smoke (all paths on hardware) ==="
timeout 2400 python tools/smoke_tpu.py > "$OUT/smoke.log" 2>&1
tail -15 "$OUT/smoke.log"

echo "done -> $OUT"
