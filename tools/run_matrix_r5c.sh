#!/usr/bin/env bash
# Round-5 continuation matrix: waits for the device tunnel to recover, then
# runs every cell the r5 plan still needs. All cells skip-if-artifact-exists
# (stale pre-r5-default artifacts were removed in-tree first), so the runner
# is idempotent — re-invoke it after any wedge and it resumes where it left
# off. Timeouts hard-kill (-k 30): a plain TERM is not deliverable while
# Python blocks in a C readback, and an orphaned client holds the device
# (observed r5: one wedged cell killed the next four cells' backend inits).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/gate_matrix_r5c.log}
SCENES=${SCENES:-/tmp/gate_scenes}

echo "=== r5c waiting for device (probe every 120s) $(date +%H:%M:%S)" | tee -a "$LOG"
until timeout 140 python - <<'EOF' >/dev/null 2>&1
import faulthandler
faulthandler.dump_traceback_later(120, exit=True)
import jax, jax.numpy as jnp
x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
assert float(x[0, 0]) == 64.0
EOF
do
  sleep 120
done
echo "=== r5c device up $(date +%H:%M:%S)" | tee -a "$LOG"

run_cell() {
  local t="$1" art="$2"; shift 2
  if [ -f "$art" ]; then
    echo "=== skip $* ($art exists)" | tee -a "$LOG"
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

run_cell 3600 benchmarks/gate_neus_blender.json \
  neus --scenes "$SCENES" --scene basic
run_cell 3600 benchmarks/gate_neus_facto_blender.json \
  neus-facto --scenes "$SCENES" --scene basic
run_cell 7200 benchmarks/gate_splatfacto_scale1k.json \
  splatfacto --scenes /tmp/gate_scenes_1k --scene basic \
  --override max_gaussians=500000 --steps 8000 --tag scale1k
run_cell 3600 benchmarks/gate_instant_ngp_masked.json \
  instant-ngp --scenes "$SCENES" --scene masked
run_cell 3600 benchmarks/gate_instant_ngp_blender.json \
  instant-ngp --scenes "$SCENES" --scene basic
run_cell 3600 benchmarks/gate_instant_ngp_bounded_blender.json \
  instant-ngp-bounded --scenes "$SCENES" --scene basic
run_cell 3600 benchmarks/gate_instant_ngp_unbounded.json \
  instant-ngp --scenes "$SCENES" --scene unbounded
run_cell 3600 benchmarks/gate_dnerf_dnerf.json \
  dnerf --scenes "$SCENES" --scene basic
run_cell 3600 benchmarks/gate_phototourism_appearance.json \
  phototourism --scenes "$SCENES" --scene basic
run_cell 5400 benchmarks/gate_nerfacto_refstack.json \
  nerfacto --scenes "$SCENES" --scene basic \
  --override num_levels=16 --override features_per_level=2 \
  --override num_nerf_samples_per_ray=48 \
  --override "num_proposal_samples_per_ray=(256, 96)" \
  --override use_occupancy_sampler=False --tag refstack

echo "MATRIX_R5C_DONE $(date +%H:%M:%S)" | tee -a "$LOG"
