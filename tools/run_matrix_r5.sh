#!/usr/bin/env bash
# Round-5 gate cells (VERDICT r4 #1-#3, #5-#6):
#   - semantic-nerfw on the semantic-labelled scene (rebuilt model)
#   - neus / neus-facto on the blender scene (the promised-but-never-run SDF cells)
#   - splatfacto-big / splatfacto-mcmc basic (never had artifacts)
#   - instant-ngp masked (died on the r4 init watchdog)
#   - instant-ngp blender/bounded/unbounded on the new contraction default
#   - refstack parity rerun with the f32 SSIM fix
#   - dnerf time-varying + phototourism appearance cells (method-specific)
# Each cell commits its artifact on success.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/gate_matrix_r5.log}
SCENES=${SCENES:-/tmp/gate_scenes}

python tools/run_gate_matrix.py --make-scenes "$SCENES" --hw 200

run_cell() {
  local t="$1" art="$2"; shift 2
  echo "=== gate $* (timeout ${t}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  if timeout "$t" python tools/run_gate_matrix.py "$@" >>"$LOG" 2>&1 && [ -f "$art" ]; then
    git add "$art" && git commit -q -m "Gate matrix r5: $*" 2>/dev/null || true
    python -c "import json; d=json.load(open('$art')); print(f\"  -> $art: PASS={d['pass']} psnr={d['metrics']['psnr']} ssim={d['metrics']['ssim']}\")" | tee -a "$LOG"
  else
    echo "GATE RUN FAILED: $* (expected $art)" | tee -a "$LOG"
  fi
}

run_cell 3600 benchmarks/gate_semantic_nerfw_semantic.json \
  semantic-nerfw --scenes "$SCENES" --scene basic
run_cell 3600 benchmarks/gate_neus_blender.json \
  neus --scenes "$SCENES" --scene basic
run_cell 3600 benchmarks/gate_neus_facto_blender.json \
  neus-facto --scenes "$SCENES" --scene basic
# splatfacto-big landed via the r4d leftover runner; mcmc only if missing
[ -f benchmarks/gate_splatfacto_mcmc.json ] || \
  run_cell 5400 benchmarks/gate_splatfacto_mcmc.json \
    splatfacto-mcmc --scenes "$SCENES" --scene basic --steps 8000
# splatfacto scale: 1024^2 / 500k-cap (VERDICT r3 #5, r4 #4 — two rounds
# overdue). Runs early so it cannot be starved by later-cell overruns.
if [ ! -f /tmp/gate_scenes_1k/basic/transforms.json ]; then
  python tools/run_gate_matrix.py --make-scenes /tmp/gate_scenes_1k --hw 1024 \
    --n-train 30 --n-test 4
fi
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

echo "MATRIX_R5_DONE $(date +%H:%M:%S)" | tee -a "$LOG"
