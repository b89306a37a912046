#!/usr/bin/env bash
# Tier-4 follow-on TPU jobs after the main gate matrix:
#   1. quality-gate the default-off perf knobs (field_bwd_level_period,
#      proposal_freeze_after) so they can become defaults if they hold
#   2. splatfacto at 1 MP (1024^2) / 500k-gaussian capacity (VERDICT r2 #4)
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/gate_matrix_r3.log}

run_cell() {
  local m="$1" scene_root="$2" scene="$3"; shift 3
  echo "=== gate $m $scene ($scene_root) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  if timeout 4200 python tools/run_gate_matrix.py "$m" --scenes "$scene_root" \
      --scene "$scene" "$@" >>"$LOG" 2>&1; then
    git add -A benchmarks >/dev/null 2>&1 || true
    git commit -q -m "Gate matrix: $m $scene $*" -- benchmarks 2>/dev/null || true
  else
    echo "GATE RUN FAILED: $m $scene" | tee -a "$LOG"
  fi
}

run_cell nerfacto /tmp/gate_scenes basic \
  --override field_bwd_level_period=2 --override proposal_freeze_after=2500 \
  --tag fastbwd

run_cell splatfacto /tmp/gate_scenes_1k basic \
  --override max_gaussians=500000 --steps 12000 --tag scale1k

echo "MATRIX_R3B_DONE $(date +%H:%M:%S)" | tee -a "$LOG"
