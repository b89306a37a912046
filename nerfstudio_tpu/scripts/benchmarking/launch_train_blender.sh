#!/bin/bash
# Blender-synthetic benchmark protocol (reference:
# scripts/benchmarking/launch_train_blender.sh): 8 scenes x 16,500 iters,
# white background, uniform initial sampler, near 2 far 6, no pose-opt, no
# appearance embedding, no scene contraction. One job per accelerator.
#
# usage: launch_train_blender.sh -m METHOD -d DATA_ROOT [-o OUT_DIR] [-s]
set -euo pipefail

method="nerfacto"
data_root="data/blender"
out_dir="benchmarks/blender"
single_scene=""
while getopts "m:d:o:s:" opt; do
  case $opt in
    m) method="$OPTARG" ;;
    d) data_root="$OPTARG" ;;
    o) out_dir="$OPTARG" ;;
    s) single_scene="$OPTARG" ;;
  esac
done

scenes=(mic ficus chair hotdog materials drums ship lego)
if [[ -n "$single_scene" ]]; then scenes=("$single_scene"); fi

for scene in "${scenes[@]}"; do
  echo "=== $method / $scene"
  nst-train "$method" \
    --data "$data_root/$scene" --dataparser blender-data \
    --trainer.output_dir "$out_dir" --trainer.experiment_name "$scene" \
    --trainer.timestamp bench --trainer.max_num_iterations 16500 \
    --trainer.vis none \
    --model.background_color white \
    --model.proposal_initial_sampler uniform \
    --model.near_plane 2.0 --model.far_plane 6.0 \
    --model.camera_optimizer_mode off \
    --model.use_appearance_embedding false \
    --model.disable_scene_contraction true
  nst-eval "$out_dir/$scene/$method/bench" \
    --output-path "$out_dir/${method}_${scene}.json"
done
python - "$out_dir" "$method" <<'PY'
import json, sys, glob
out, method = sys.argv[1], sys.argv[2]
rows = []
for f in sorted(glob.glob(f"{out}/{method}_*.json")):
    r = json.load(open(f))
    rows.append((r.get("experiment_name", f), r["results"]["psnr"], r["results"]["ssim"]))
for name, psnr, ssim in rows:
    print(f"{name:12s} psnr={psnr:6.2f} ssim={ssim:.4f}")
if rows:
    import statistics as st
    print(f"{'MEAN':12s} psnr={st.mean(r[1] for r in rows):6.2f} ssim={st.mean(r[2] for r in rows):.4f}")
PY
