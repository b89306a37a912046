#!/usr/bin/env bash
# Round-3 gate matrix, priority-ordered so the highest-evidence cells land
# first, committing each benchmarks/gate_*.json as it is produced (the
# driver can end the session mid-matrix; committed cells survive).
# Tier 1: flagship methods on every scene family; Tier 2: the rest of the
# registry on basic; Tier 3: reference-hyperparameter parity ablations.
set -uo pipefail
cd "$(dirname "$0")/.."

SCENES=${SCENES:-/tmp/gate_scenes}
LOG=${LOG:-/tmp/gate_matrix_r3.log}

run_cell() {
  local m="$1" scene="$2"; shift 2
  echo "=== gate $m $scene $(date +%H:%M:%S) ===" | tee -a "$LOG"
  if timeout 3000 python tools/run_gate_matrix.py "$m" --scenes "$SCENES" \
      --scene "$scene" "$@" >>"$LOG" 2>&1; then
    git add -A benchmarks >/dev/null 2>&1 || true
    git commit -q -m "Gate matrix: $m $scene" -- benchmarks 2>/dev/null || true
  else
    echo "GATE RUN FAILED: $m $scene" | tee -a "$LOG"
  fi
}

# Tier 1 — flagship coverage across scene families
run_cell nerfacto basic
run_cell splatfacto basic
run_cell instant-ngp basic          # routed to the blender protocol scene
run_cell instant-ngp-bounded basic
run_cell nerfacto distorted
run_cell nerfacto masked
run_cell splatfacto unbounded
run_cell splatfacto masked
run_cell splatfacto distorted
run_cell instant-ngp unbounded
run_cell instant-ngp masked

# Tier 2 — remaining registry on basic
for m in depth-nerfacto vanilla-nerf mipnerf tensorf dnerf neus neus-facto \
         semantic-nerfw phototourism nerfacto-big nerfacto-huge \
         splatfacto-big splatfacto-mcmc; do
  run_cell "$m" basic
done

# Tier 3 — reference-hyperparameter parity stack (VERDICT r2 #8)
REF_OV=(--override num_levels=16 --override features_per_level=2
        --override num_nerf_samples_per_ray=48
        --override "num_proposal_samples_per_ray=(256, 96)"
        --override use_occupancy_sampler=False --tag refstack)
run_cell nerfacto basic "${REF_OV[@]}"
run_cell nerfacto unbounded "${REF_OV[@]}"

echo "MATRIX_DONE $(date +%H:%M:%S)" | tee -a "$LOG"
