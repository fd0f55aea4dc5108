#!/usr/bin/env bash
# Round-4 TPU measurement pass (one process at a time, serial).
#
# Covers: headline regression guard after the carry_uv-for-images kernel
# change, the NEW noise/marble kernel branch (Mosaic lowering proof +
# bench row), the megakernel G-buffer cost across the scene-size story
# (round-3 VERDICT Next #3), denoise end-to-end on the streamed
# terrain_big (#3), and the adaptive x streamed decay curve (#2c).
#
# Usage: bash tools/run_tpu_measurements_r4.sh [outfile]

set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_measurements_r4.out}"
: > "$OUT"

run() {
  echo "=== $* ===" | tee -a "$OUT"
  CRT_BENCH_PROBE_BUDGET_S=600 timeout 1800 python "$@" 2>>"$OUT" | tee -a "$OUT"
  echo "--- exit $? ---" | tee -a "$OUT"
  echo >> "$OUT"
}

# 1. headline guard: must hold ~16.9 ms / ~124 Mrays/s (BASELINE v14)
run bench.py
# 2. NEW in-kernel noise/marble branch on the real chip
run bench.py --scene marble
# 3. vattr + image guard after the carry_uv unification
run bench.py --scene terrain
# 3b. NEW round-4 feature branches on the real chip (media + motion + box)
run bench.py --scene smoke
run bench.py --scene bounce
run bench.py --scene cornell_smoke
# 4. megakernel G-buffer across the size story (incl. streamed 20k)
run tools/gbuffer_probe.py
# 5. denoise display path end-to-end on the streamed scene
run tools/denoise_probe.py --scene terrain_big
# 6. adaptive x streamed decay (terrain_big, default knobs)
run tools/adaptive_perf_probe.py --scene terrain_big --decay-only

echo "results in $OUT"
