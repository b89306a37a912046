#!/usr/bin/env bash
# Round-5 endgame matrix: the cells still missing, ordered by value-per-
# minute for the session tail (fast high-confidence rows first, the 1 MP
# splat scale cell and the slow refstack ablation last). Same contract as
# r5c: skip-if-artifact-exists, hard-kill timeouts, per-cell commit,
# self-healing loop with a device probe between rounds.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/gate_matrix_r5d.log}
SCENES=${SCENES:-/tmp/gate_scenes}
MAX_ROUNDS=${MAX_ROUNDS:-6}

probe_device() {
  timeout 140 python - <<'EOF' >/dev/null 2>&1
import faulthandler
faulthandler.dump_traceback_later(120, exit=True)
import jax, jax.numpy as jnp
x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
assert float(x[0, 0]) == 64.0
EOF
}

run_cell() {
  local t="$1" art="$2"; shift 2
  if [ -f "$art" ]; then
    return 0
  fi
  echo "=== gate $* (timeout ${t}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  if timeout -k 30 "$t" python tools/run_gate_matrix.py "$@" >>"$LOG" 2>&1 && [ -f "$art" ]; then
    git add "$art" && git commit -q -m "Gate matrix r5: $*" 2>/dev/null || true
    python -c "import json; d=json.load(open('$art')); print(f\"  -> $art: PASS={d['pass']} psnr={d['metrics']['psnr']} ssim={d['metrics']['ssim']}\")" | tee -a "$LOG"
  else
    echo "GATE RUN FAILED: $* (expected $art)" | tee -a "$LOG"
  fi
}

all_cells() {
  run_cell 2700 benchmarks/gate_instant_ngp_blender.json \
    instant-ngp --scenes "$SCENES" --scene basic
  run_cell 2700 benchmarks/gate_instant_ngp_bounded_blender.json \
    instant-ngp-bounded --scenes "$SCENES" --scene basic
  run_cell 2700 benchmarks/gate_dnerf_dnerf.json \
    dnerf --scenes "$SCENES" --scene basic
  run_cell 2700 benchmarks/gate_phototourism_appearance.json \
    phototourism --scenes "$SCENES" --scene basic
  run_cell 2700 benchmarks/gate_neus_blender.json \
    neus --scenes "$SCENES" --scene basic
  run_cell 2700 benchmarks/gate_instant_ngp_masked.json \
    instant-ngp --scenes "$SCENES" --scene masked
  run_cell 2700 benchmarks/gate_instant_ngp_unbounded.json \
    instant-ngp --scenes "$SCENES" --scene unbounded
  run_cell 3600 benchmarks/gate_neus_facto_blender.json \
    neus-facto --scenes "$SCENES" --scene basic
  # 5000 steps (was 8000): the r5 run measured ~600 ms/step at 1 MP with the
  # bucket growing toward 500k — 8000 steps overran its drain window; splat
  # gates clear comfortably by 5k on this scene class
  run_cell 7200 benchmarks/gate_splatfacto_scale1k.json \
    splatfacto --scenes /tmp/gate_scenes_1k --scene basic \
    --override max_gaussians=500000 --steps 5000 --tag scale1k
  run_cell 5400 benchmarks/gate_nerfacto_refstack.json \
    nerfacto --scenes "$SCENES" --scene basic \
    --override num_levels=16 --override features_per_level=2 \
    --override num_nerf_samples_per_ray=48 \
    --override "num_proposal_samples_per_ray=(256, 96)" \
    --override use_occupancy_sampler=False --tag refstack
}

missing_count() {
  local n=0
  for a in gate_instant_ngp_blender gate_instant_ngp_bounded_blender \
           gate_dnerf_dnerf gate_phototourism_appearance gate_neus_blender \
           gate_instant_ngp_masked gate_instant_ngp_unbounded \
           gate_neus_facto_blender gate_splatfacto_scale1k \
           gate_nerfacto_refstack; do
    [ -f "benchmarks/$a.json" ] || n=$((n + 1))
  done
  echo "$n"
}

for round in $(seq 1 "$MAX_ROUNDS"); do
  left=$(missing_count)
  if [ "$left" -eq 0 ]; then
    break
  fi
  echo "=== r5d round $round: $left cells missing; waiting for device $(date +%H:%M:%S)" | tee -a "$LOG"
  until probe_device; do sleep 60; done
  echo "=== r5d device up $(date +%H:%M:%S)" | tee -a "$LOG"
  all_cells
done

echo "MATRIX_R5D_DONE missing=$(missing_count) $(date +%H:%M:%S)" | tee -a "$LOG"
