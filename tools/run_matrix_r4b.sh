#!/usr/bin/env bash
# Round-4 tier 3/4 cells (run AFTER run_matrix_r4.sh):
#   tier 3 — reference-hyperparameter parity ablation on a second scene
#            (basic ran as the r4 diagnosis cell)
#   tier 4 — perf-knob quality gate (field_bwd_level_period /
#            proposal_freeze_after) and splatfacto at 1 MP / 500k gaussians.
# ADVICE r3 fixes: the 1 MP scene root is bootstrapped here; timeouts are
# sized from measured per-method step times, not one constant.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/gate_matrix_r4.log}

run_cell() {
  local t="$1" art="$2"; shift 2
  echo "=== gate $* (timeout ${t}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  if timeout "$t" python tools/run_gate_matrix.py "$@" >>"$LOG" 2>&1 && [ -f "$art" ]; then
    git add "$art" && git commit -q -m "Gate matrix r4b: $*" 2>/dev/null || true
    python -c "import json,sys; d=json.load(open('$art')); print(f\"  -> $art: PASS={d['pass']} psnr={d['metrics']['psnr']} ssim={d['metrics']['ssim']}\")" | tee -a "$LOG"
  else
    echo "GATE RUN FAILED: $* (expected $art)" | tee -a "$LOG"
  fi
}

# Tier 3 — refstack parity on the unbounded scene (VERDICT r3 #7)
run_cell 5400 benchmarks/gate_nerfacto_unbounded_refstack.json \
  nerfacto --scenes /tmp/gate_scenes --scene unbounded \
  --override num_levels=16 --override features_per_level=2 \
  --override num_nerf_samples_per_ray=48 \
  --override "num_proposal_samples_per_ray=(256, 96)" \
  --override use_occupancy_sampler=False --tag refstack

# Tier 4 — perf-knob quality gate (VERDICT r3 #4)
run_cell 2400 benchmarks/gate_nerfacto_fastbwd.json \
  nerfacto --scenes /tmp/gate_scenes --scene basic \
  --override field_bwd_level_period=2 --override proposal_freeze_after=2500 \
  --tag fastbwd

# Tier 4 — splatfacto scale: 1024^2 / 500k-gaussian capacity (VERDICT r3 #5).
# Bootstrap the 1 MP scene root if absent (ADVICE r3: nothing created it).
# Timeout sized from measurement: ~238 ms/step upper bound at this scale x
# 8000 steps = ~32 min train; compile + 1 MP eval adds minutes -> 7200 s.
if [ ! -f /tmp/gate_scenes_1k/basic/transforms.json ]; then
  python tools/run_gate_matrix.py --make-scenes /tmp/gate_scenes_1k --hw 1024 \
    --n-train 30 --n-test 4
fi
run_cell 7200 benchmarks/gate_splatfacto_scale1k.json \
  splatfacto --scenes /tmp/gate_scenes_1k --scene basic \
  --override max_gaussians=500000 --steps 8000 --tag scale1k

echo "MATRIX_R4B_DONE $(date +%H:%M:%S)" | tee -a "$LOG"
