#!/bin/bash
# Per-tile staging sweep: rows x SOFTBODY_TILE_BATCH on the real chip.
# Usage: bash tools/sweep_staging.sh [particles] [steps]
P=${1:-100000}
S=${2:-400}
cd "$(dirname "$0")/.."
for cfg in "32 1" "32 2" "64 1" "64 2" "16 2" "16 4"; do
  set -- $cfg
  rows=$1; tb=$2
  echo "=== rows=$rows TILE_BATCH=$tb ==="
  SOFTBODY_TILE_BATCH=$tb timeout 900 python bench.py --particles "$P" \
    --steps "$S" --repeats 2 --rows "$rows" --verbose 2>&1 | tail -4
done
