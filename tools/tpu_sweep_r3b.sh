#!/bin/bash
# Round-3 follow-up: the decisive combos around the measured winners
# (rows=64 fwd +4.4%, bf16 pair slab +10.8% at rows=32).
set -u
OUT="${1:-/tmp/tpu_sweep_r3b.log}"
cd "$(dirname "$0")/.."

run() {
  echo "=== $* [$(env | grep SOFTBODY_ | tr '\n' ' ')] ===" | tee -a "$OUT"
  timeout 1800 "$@" 2>&1 | tail -3 | tee -a "$OUT"
}

run python bench.py --steps 500 --repeats 3 --rows 64 --pair-dtype bfloat16
run python bench.py --steps 500 --repeats 2 --rows 64 --grad --pair-dtype bfloat16
run python bench.py --steps 500 --repeats 2 --rows 64 --grad

echo "sweep done -> $OUT"
