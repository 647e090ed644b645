#!/bin/bash
# One quiet pass of the 34-entry scale suite (the SCALE_r11.json set) on
# the generated fixtures at the given scale factors, one Bench process per
# scale, artifacts to target/scale/bench_sf<sf>.json. Usage:
#   tools/scalerun.sh <entries-csv> <sf> [<sf>...]
# Memory: sf>=1 runs get a large heap (the sf1 corpus is 500k docs and the
# exact-substring gram stream peaks well past the 8g default).
set -euo pipefail
cd "$(dirname "$0")/.."
entries="$1"; shift
mkdir -p target/scale
for sf in "$@"; do
  mem=8g
  case "$sf" in
    1|1.0) mem=64g ;;
    10|10.0) mem=96g ;;
  esac
  echo "[scalerun] sf$sf (driver mem $mem)"
  SPARK_DRIVER_MEM=$mem \
  SPARK_GRAFT_SF_DIR="target/gen/sf$sf" \
  SPARK_GRAFT_BENCH_ONLY="$entries" \
  SPARK_GRAFT_BENCH_OUT="target/scale/bench_sf$sf.json" \
    tools/runjvm.sh graft.Bench 2>"target/scale/bench_sf$sf.err" | tail -1
done
