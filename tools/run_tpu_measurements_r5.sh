#!/usr/bin/env bash
# Round-5 TPU measurement pass (one process at a time, serial).
#
# Covers the round-4 VERDICT's demands:
#  1. NEE hardware validation: the kernel==XLA contract tests (NEE incl.
#     triangle emitters, rotated box media, sphere/box media, motion),
#     has_nee frame cost on cornell + the nee-off headline guard, and
#     the equal-quality-time payoff (tools/nee_probe.py).
#  4. Streamed G-buffer re-measure post flat-gather (gbuffer_probe).
#  8. Display poll cost by format (denoise_probe now decomposes
#     pull + PNG/JPEG encode + bytes).
# Plus: rotated cornell_smoke frame cost (the new has_rotm branch).
#
# Usage: bash tools/run_tpu_measurements_r5.sh [outfile]

set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_measurements_r5.out}"
: > "$OUT"

run() {
  echo "=== $* ===" | tee -a "$OUT"
  CRT_BENCH_PROBE_BUDGET_S=600 timeout 1800 "$@" 2>>"$OUT" | tee -a "$OUT"
  echo "--- exit $? ---" | tee -a "$OUT"
  echo >> "$OUT"
}

# 1a. the hardware contract tests (each runs the TPU work in a fresh
#     subprocess; serial, one at a time)
run env CRT_TPU_TESTS=1 python -m pytest -q -p no:cacheprovider \
    tests/test_nee_kernel.py::test_kernel_nee_matches_xla_nee_tpu \
    tests/test_media_box.py::test_pallas_rotated_box_matches_xla_tpu \
    tests/test_media_box.py::test_pallas_box_medium_matches_xla_tpu

# 1b. headline guard: nee-off scenes must hold ~125 Mrays/s
run python bench.py
# 1c. has_nee frame cost (cornell on/off; the registered scene)
run python bench.py --scene cornell
run python bench.py --scene cornell --nee
run python bench.py --scene cornell_mesh_light
run python bench.py --scene cornell_mesh_light --nee
# rotated-box chord cost (cornell_smoke now compiles has_rotm)
run python bench.py --scene cornell_smoke
# 1d. the payoff number (equal-quality time, small-light + mesh-light)
run python tools/nee_probe.py

# 4. streamed G-buffer re-measure post flat-gather (terrain_big row)
run python tools/gbuffer_probe.py

# 8. display poll decomposition on the big streamed scene
run python tools/denoise_probe.py --scene terrain_big

# QMC: megakernel==XLA R2 raygen contract + the honest payoff probe
# (banked verdict: a wash at depth 12 — see BASELINE.md)
run env CRT_TPU_TESTS=1 python -m pytest -q -p no:cacheprovider \
    tests/test_qmc.py::test_kernel_qmc_matches_xla_qmc_tpu
run python tools/qmc_probe.py

# book2_final capstone (all static flags in ONE kernel; its 951.6 KB
# table overflows resident SMEM and routes to the HBM-streamed layout —
# BASELINE.md "SMEM primitive ceiling" round-5 addendum)
run python examples/render_gallery.py --tpu --only book2_final --spp 256
run python bench.py --scene book2_final

echo "results in $OUT"
