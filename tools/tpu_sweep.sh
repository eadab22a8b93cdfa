#!/bin/bash
# One-shot measurement sweep for when the axon tunnel is up (it died for ~9h
# mid round 2 — batch everything so one tunnel window suffices).
# Usage: bash tools/tpu_sweep.sh [outfile]
set -u
OUT="${1:-/tmp/tpu_sweep_$(date +%H%M).log}"
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" | tee -a "$OUT"
  timeout 1200 "$@" 2>&1 | tail -3 | tee -a "$OUT"
}

# 0. feasibility probes (Mosaic gates for the v5 lane-major row-side design)
run python tools/layout_probe.py --tiles 2048 --iters 30
run python tools/dma_probe.py --tiles 1024 --iters 30

# 1. current headline (sparse) + bf16 + grad
run python bench.py --steps 500 --repeats 2
run python bench.py --steps 500 --repeats 2 --pair-dtype bfloat16
run python bench.py --steps 300 --repeats 2 --grad

echo "sweep done -> $OUT"
