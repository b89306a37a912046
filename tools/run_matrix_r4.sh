#!/usr/bin/env bash
# Round-4 gate matrix (VERDICT r3 #2): every registered method on shipped
# defaults, priority-ordered, committing each cell artifact as it lands.
# ADVICE r3 fixes: per-method timeouts derived from DEFAULT_STEPS x measured
# step times (not one constant), deterministic per-cell staging (never
# `git add -A benchmarks`), and the 1 MP scale root is bootstrapped here.
set -uo pipefail
cd "$(dirname "$0")/.."

SCENES=${SCENES:-/tmp/gate_scenes}
LOG=${LOG:-/tmp/gate_matrix_r4.log}

python tools/run_gate_matrix.py --make-scenes "$SCENES" --hw 200

# generous per-method ceilings: steps x measured-or-estimated s/step + 900 s
# compile+eval margin (measured r3/r4: nerfacto 0.05 s/step @200^2,
# instant-ngp 0.033, splatfacto ~0.08 @200^2; vanilla/mipnerf unmeasured ->
# sized by sample count)
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
    splatfacto|splatfacto-big|splatfacto-mcmc) echo 3600 ;;
    *)                             echo 3600 ;;
  esac
}

run_cell() {
  local m="$1" scene="$2" root="$3"
  # deterministic artifact name (mirrors run_gate_matrix.py's output rule);
  # blender-format methods' basic cells are routed to the blender scene
  local suffix=""
  [ "$scene" != basic ] && suffix="_${scene}"
  case "$m" in instant-ngp*|vanilla-nerf|mipnerf|dnerf|tensorf)
    [ "$scene" = basic ] && suffix="_blender" ;; esac
  local art="benchmarks/gate_${m//-/_}${suffix}.json"
  local t; t=$(cell_timeout "$m")
  echo "=== gate $m $scene (timeout ${t}s) $(date +%H:%M:%S) ===" | tee -a "$LOG"
  if timeout "$t" python tools/run_gate_matrix.py "$m" --scenes "$root" \
      --scene "$scene" >>"$LOG" 2>&1 && [ -f "$art" ]; then
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

# Tier 1 — flagship coverage across scene families
run_cell nerfacto basic "$SCENES"
run_cell splatfacto basic "$SCENES"
run_cell instant-ngp basic "$SCENES"      # routed to the blender protocol scene
run_cell instant-ngp-bounded basic "$SCENES"
run_cell nerfacto unbounded "$SCENES"
run_cell nerfacto distorted "$SCENES"
run_cell nerfacto masked "$SCENES"
run_cell splatfacto unbounded "$SCENES"
run_cell splatfacto masked "$SCENES"
run_cell splatfacto distorted "$SCENES"
run_cell instant-ngp unbounded "$SCENES"
run_cell instant-ngp masked "$SCENES"

# Tier 2 — remaining registry on basic
for m in depth-nerfacto vanilla-nerf mipnerf tensorf dnerf neus neus-facto \
         semantic-nerfw phototourism nerfacto-big nerfacto-huge \
         splatfacto-big splatfacto-mcmc; do
  run_cell "$m" basic "$SCENES"
done

echo "MATRIX_R4_DONE $(date +%H:%M:%S)" | tee -a "$LOG"
python tools/summarize_gates.py --write 2>&1 | tail -3 || true
git add CONVERGENCE.md && git commit -q -m "CONVERGENCE.md: auto-generated r4 gate matrix table" || true
