#!/usr/bin/env bash
# Round-4 final matrix pass: re-run the nerfacto-family scene cells under the
# NEW shipped defaults (field_bwd_level_period=2, proposal_freeze_after=2500,
# commit e2fb698) so every committed artifact matches shipped code, then the
# remaining registry + splat cells (capacity-bucketed, 8000 steps).
set -uo pipefail
cd "$(dirname "$0")/.."
SCENES=${SCENES:-/tmp/gate_scenes}
LOG=${LOG:-/tmp/gate_matrix_r4.log}

cell_timeout() {
  case "$1" in
    nerfacto|depth-nerfacto)       echo 2400 ;;
    nerfacto-big)                  echo 3000 ;;
    nerfacto-huge)                 echo 3600 ;;
    instant-ngp|instant-ngp-bounded) echo 1500 ;;
    vanilla-nerf|mipnerf|dnerf)    echo 5400 ;;
    tensorf)                       echo 3000 ;;
    neus|neus-facto)               echo 5400 ;;
    semantic-nerfw|phototourism)   echo 3600 ;;
    splatfacto|splatfacto-big|splatfacto-mcmc) echo 5400 ;;
    *)                             echo 3600 ;;
  esac
}

run_cell() {
  local m="$1" scene="$2"; shift 2
  local suffix=""
  [ "$scene" != basic ] && suffix="_${scene}"
  case "$m" in instant-ngp*|vanilla-nerf|mipnerf|dnerf|tensorf)
    [ "$scene" = basic ] && suffix="_blender" ;; esac
  local art="benchmarks/gate_${m//-/_}${suffix}.json"
  local t; t=$(cell_timeout "$m")
  echo "=== gate $m $scene (timeout ${t}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  if timeout "$t" python tools/run_gate_matrix.py "$m" --scenes "$SCENES" \
      --scene "$scene" "$@" >>"$LOG" 2>&1 && [ -f "$art" ]; then
    git add "$art" && git commit -q -m "Gate matrix r4: $m $scene" 2>/dev/null || true
    python - "$art" <<'PY' | tee -a "$LOG"
import json, sys
d = json.load(open(sys.argv[1]))
print(f"  -> {sys.argv[1]}: PASS={d['pass']} psnr={d['metrics']['psnr']} ssim={d['metrics']['ssim']}")
PY
  else
    echo "GATE RUN FAILED: $m $scene (expected $art)" | tee -a "$LOG"
  fi
}

# nerfacto-family re-runs on the flipped defaults
run_cell nerfacto basic
run_cell nerfacto unbounded
run_cell nerfacto distorted
run_cell nerfacto masked

# Tier 2 breadth — remaining registry on basic
for m in depth-nerfacto tensorf vanilla-nerf mipnerf dnerf neus neus-facto \
         semantic-nerfw phototourism nerfacto-big nerfacto-huge; do
  run_cell "$m" basic
done

# instant-ngp remaining scenes + protocol-fixed bounded rerun
run_cell instant-ngp-bounded basic
run_cell instant-ngp unbounded
run_cell instant-ngp masked

# splat cells at 8000 steps (capacity buckets; see PERF.md r4)
for cell in basic masked distorted; do
  run_cell splatfacto "$cell" --steps 8000
done
run_cell splatfacto-big basic --steps 8000
run_cell splatfacto-mcmc basic --steps 8000

echo "MATRIX_R4D_DONE $(date +%H:%M:%S)" | tee -a "$LOG"
python tools/summarize_gates.py --write 2>&1 | tail -3 || true
git add CONVERGENCE.md && git commit -q -m "CONVERGENCE.md: r4 gate matrix table" || true
