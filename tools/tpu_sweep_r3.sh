#!/bin/bash
# Round-3 measurement sweep under the v4 lane-major kernels (run when the
# chip is free).  Usage: bash tools/tpu_sweep_r3.sh [outfile]
set -u
OUT="${1:-/tmp/tpu_sweep_r3_$(date +%H%M).log}"
cd "$(dirname "$0")/.."

run() {
  echo "=== $* [$(env | grep SOFTBODY_ | tr '\n' ' ')] ===" | tee -a "$OUT"
  timeout 1500 "$@" 2>&1 | tail -4 | tee -a "$OUT"
}

# 1. headline forward: defaults, then rows sweep (v4 tb = 128/rows)
run python bench.py --steps 500 --repeats 3
run python bench.py --steps 500 --repeats 3 --rows 64
run python bench.py --steps 500 --repeats 3 --rows 16

# 2. bf16 storage-only S|R slab under v4
run python bench.py --steps 500 --repeats 3 --pair-dtype bfloat16

# 3. K2 chunk cap
SOFTBODY_K2_MAX_CHUNK=768 run python bench.py --steps 500 --repeats 3

# 4. gradient path: defaults + bwd tile chunk sweep
run python bench.py --steps 500 --repeats 2 --grad
SOFTBODY_BWD_TILE_CHUNK=1024 run python bench.py --steps 500 --repeats 2 --grad
SOFTBODY_BWD_TILE_CHUNK=4096 run python bench.py --steps 500 --repeats 2 --grad
run python bench.py --steps 500 --repeats 2 --grad --pair-dtype bfloat16

echo "sweep done -> $OUT"
