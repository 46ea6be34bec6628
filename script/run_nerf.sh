#!/bin/bash
# Two-stage NeRF-synthetic recipe — analogue of the reference
# `script/run_nerf.sh`: stage-1 base 3DGS, then stage-2 NeILF PBR
# resuming from the stage-1 checkpoint with the PBR loss set.
# Usage: bash script/run_nerf.sh <dataset_root> <output_root> [scene...]
set -e
root=${1:?dataset root}
out=${2:?output root}
shift 2
scenes=${@:-lego}

for scene in $scenes; do
  echo "=== $scene: stage 1 (base 3DGS) ==="
  python train.py -s "$root/$scene" -m "$out/$scene" -t render \
      -w --eval --iterations 30000 \
      --lambda_mask_entropy 0.1 --lambda_normal_render_depth 0.01

  echo "=== $scene: stage 2 (NeILF PBR) ==="
  python train.py -s "$root/$scene" -m "$out/${scene}_neilf" -t neilf \
      -c "$out/$scene/ply/point_cloud_30000.ply" \
      -w --eval --iterations 40000 --sample_num 24 \
      --lambda_mask_entropy 0.1 --lambda_normal_render_depth 0.01 \
      --lambda_light 0.01 --lambda_base_color 0.005 \
      --lambda_base_color_smooth 0.006 --lambda_metallic_smooth 0.002 \
      --lambda_roughness_smooth 0.002 --lambda_visibility 0.1 \
      --finetune_visibility
done
