#!/usr/bin/env bash
# Round-5 retry pass: cells the main r5 run lost to device-tunnel wedges.
#   - neus: died on a transient FAILED_PRECONDITION at pipeline build
#   - neus-facto: readback wedged >50 min; plain `timeout` TERM is NOT
#     deliverable while Python blocks in the C readback, so the orphan held
#     the device and also killed the next cell's backend init -> -k 30
#     hard-kills here
#   - splatfacto scale1k: collateral of the above (backend-init watchdog)
# Skips any cell whose artifact already exists, so this runner is
# idempotent and safe to re-invoke until the matrix is complete.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/gate_matrix_r5b.log}
SCENES=${SCENES:-/tmp/gate_scenes}

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

echo "MATRIX_R5B_DONE $(date +%H:%M:%S)" | tee -a "$LOG"
