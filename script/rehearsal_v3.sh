#!/bin/bash
# Round-5 dress rehearsal on the HARD procedural scene (VERDICT r4
# item 3): data/rehearsal_scene_v3 — 800², 64 train / 8 test views,
# 150k GT splats with THIN geometry (torus ring + rod fence),
# tanh-sharpened high-frequency albedo, and volume clutter; generated
# by tools/make_synthetic_scene.py --variant v3.  This stresses
# densify/prune and the per-tile depth budget — the K-overflow
# continuation must keep dropped_tile == 0 throughout (reference
# exactness bar: rasterizer_impl.cu:343-384).
#
# Same two-stage recipe as v2 (reference script/run_nerf.sh:6-34):
# stage-1 base 3DGS 7000 iters (not a multiple of the 3000-iter opacity
# reset), stage-2 NeILF PBR 3000 iters from the stage-1 PLY.
# Every phase is resume-safe.
# ITERS1/ITERS2 override the stage lengths (both resume-safe — re-run
# with larger values to extend a finished stage).  ITERS1 must not be a
# multiple of the 3000-iter opacity reset.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
ITERS1=${ITERS1:-7000}
ITERS2=${ITERS2:-3000}

# ---- stage 1: base 3DGS ------------------------------------------------
python train.py -s data/rehearsal_scene_v3 -m runs/r5_stage1 \
  -t render --eval --resume --iterations $ITERS1 \
  --densification_interval 500 \
  --lambda_normal_render_depth 0.01 --lambda_mask_entropy 0.1 \
  --save_interval 1000 --test_interval 1000 --log_interval 200 \
  --capacity 262144 || exit 1

# ---- stage 2: NeILF from the stage-1 PLY -------------------------------
python train.py -s data/rehearsal_scene_v3 -m runs/r5_stage2 \
  -t neilf --eval -c runs/r5_stage1/ply/point_cloud_${ITERS1}.ply \
  --resume --sample_num 24 \
  --lambda_normal_render_depth 0.01 --lambda_mask_entropy 0.1 \
  --save_interval 1000 --test_interval 1000 --log_interval 100 \
  --iterations $ITERS2 --capacity 262144 || exit 1

echo REHEARSAL-V3-COMPLETE
