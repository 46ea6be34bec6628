#!/bin/bash
# Full-recipe dress rehearsal on the procedural 800-px 64-view scene
# rendered by this framework (data/rehearsal_scene, 60k GT splats,
# init = 15k noisy subsample).
#
# Mirrors the reference two-stage recipe (reference script/run_nerf.sh:6-34)
# at reduced iteration counts sized for a single v5e chip session:
#   stage 1: base 3DGS, densification growing P, 7000 iters.
#            NOT a multiple of opacity_reset_interval (3000): ending a
#            run exactly on a reset (as round 3's 6000-iter run did)
#            evaluates the just-clamped opacities and wrecks eval.
#            --densification_interval 500 matches the reference NeRF-syn
#            recipe (run_nerf.sh:12).
#   stage 2: NeILF PBR from the stage-1 PLY, split into two invocations
#            so --resume restores the full PBR TrainState mid-stage.
# v2 scene PNGs are RGBA (alpha = rendered opacity), so the reference
# recipe's --lambda_mask_entropy 0.1 is active (run_nerf.sh:11).
# Final eval.txt per stage under <run>/eval/.
#
# Every phase is resume-safe: a completed stage resumes at its final
# snapshot, skips the train loop, and only re-runs its eval; an
# interrupted stage continues from its newest snapshot.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

# ---- stage 1: base 3DGS to 7000 -----------------------------------------
python train.py -s data/rehearsal_scene_v2 -m runs/r4_stage1 \
  -t render --eval --resume --iterations 7000 \
  --densification_interval 500 \
  --lambda_normal_render_depth 0.01 --lambda_mask_entropy 0.1 \
  --save_interval 1000 --test_interval 1000 --log_interval 200 \
  --capacity 131072 || exit 1

# ---- stage 2a: NeILF from the stage-1 PLY (first 1000 iters) ------------
python train.py -s data/rehearsal_scene_v2 -m runs/r4_stage2 \
  -t neilf --eval -c runs/r4_stage1/ply/point_cloud_7000.ply \
  --resume --sample_num 24 \
  --lambda_normal_render_depth 0.01 --lambda_mask_entropy 0.1 \
  --save_interval 1000 --test_interval 1000 --log_interval 100 \
  --iterations 1000 --capacity 131072 || exit 1

# ---- stage 2b: mid-stage resume (opt moments + step) to 3000 ------------
python train.py -s data/rehearsal_scene_v2 -m runs/r4_stage2 \
  -t neilf --eval -c runs/r4_stage1/ply/point_cloud_7000.ply \
  --resume --sample_num 24 \
  --lambda_normal_render_depth 0.01 --lambda_mask_entropy 0.1 \
  --save_interval 1000 --test_interval 1000 --log_interval 100 \
  --iterations 3000 --capacity 131072 || exit 1

echo REHEARSAL-COMPLETE
