#!/usr/bin/env bash
# Queued TPU measurements for when the tunneled chip is healthy.
#
# The round-3 carry_uv kernel change and the new mesh workloads were
# verified on CPU (tests + interpret mode) while the tunnel was down;
# this script banks the pending real-chip numbers in one pass and drops
# the JSON lines into /tmp/tpu_measurements.out for BASELINE.md rows.
#
# Usage: bash tools/run_tpu_measurements.sh [outfile]
# Each bench already guards itself with a bounded backend probe
# (bench.py await_backend): a dead tunnel fails fast instead of hanging.

set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_measurements.out}"
: > "$OUT"

run() {
  echo "=== $* ===" | tee -a "$OUT"
  # per-command bound > probe budget so a dead tunnel exits via the
  # bench's own fail-fast (exit 1), never via SIGTERM mid-TPU-execution
  CRT_BENCH_PROBE_BUDGET_S=600 timeout 1800 python "$@" 2>>"$OUT" | tee -a "$OUT"
  echo >> "$OUT"
}

# 1. headline sanity: must stay ~16.6 ms / >=120 Mrays/s (BASELINE v14)
run bench.py
# 2. carry_uv delta: mesh_smooth was 39.0 ms / 48.5 Mrays/s with the
#    payload plane-reconstruction (BASELINE.md vattr row)
run bench.py --scene mesh_smooth
# 3. mesh baseline refresh (look_at camera): was 24.9 ms / 75.9 Mrays/s
run bench.py --scene mesh_demo
# 4. NEW terrain workload (968 tris + vattrs + image deferral)
run bench.py --scene terrain
# 5. scene-scaling check: rtow_big was 88 Mrays/s (documented plateau)
run bench.py --scene rtow_big
# 6. sharded megakernel compiled on the real chip (1x1 mesh)
run bench.py --multichip 1 --multichip-real
# 7. SMEM primitive-ceiling bisection (sizes the round-4 scaling design).
# Own generous bound: ~18 attempts x up to 300s each + fault-recovery
# idles — the shared 1800s run() bound would SIGTERM it mid-bisection
echo "=== tools/smem_probe.py ===" | tee -a "$OUT"
timeout 14400 python tools/smem_probe.py 2>>"$OUT" | tee -a "$OUT"

echo "results in $OUT"
