#!/bin/bash
# Full-recipe dress rehearsal (VERDICT r2 item 6) on the procedural
# 800-px 64-view scene rendered by this framework (data/rehearsal_scene).
#
# Mirrors the reference two-stage recipe (reference script/run_nerf.sh:6-34)
# at reduced iteration counts sized for a single v5e chip session:
#   stage 1: base 3DGS with densification growing P (6k iters),
#            mid-run kill + --resume already exercised (session cut at
#            it 2400; this script resumes from snap_2000)
#   stage 2: NeILF PBR from the stage-1 PLY, split into two invocations
#            so --resume restores the full PBR TrainState mid-stage.
#            (Visibility: the cell tracer is timed separately on the
#            stage-2 splats at sample_num=384 — script/trace_timing.py —
#            the 1000-iter dense finetune does not fit the session.)
# Final eval.txt (PSNR/SSIM/lpips-labelled) per stage under <run>/eval/.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

# ---- stage 1: resume at it 2000, run to 6000 ----------------------------
python train.py -s data/rehearsal_scene -m runs/rehearsal_stage1 \
  -t render --eval --resume --iterations 6000 \
  --lambda_mask_entropy 0.1 --lambda_normal_render_depth 0.01 \
  --save_interval 2000 --test_interval 1000 --log_interval 200 \
  --capacity 131072 || exit 1

# ---- stage 2a: NeILF from the stage-1 PLY (first 1000 iters) ------------
python train.py -s data/rehearsal_scene -m runs/rehearsal_stage2 \
  -t neilf --eval -c runs/rehearsal_stage1/ply/point_cloud_6000.ply \
  --sample_num 24 \
  --lambda_mask_entropy 0.1 --lambda_normal_render_depth 0.01 \
  --save_interval 1000 --test_interval 1000 --log_interval 100 \
  --iterations 1000 --capacity 131072 || exit 1

# ---- stage 2b: mid-stage resume (opt moments + step) to 2000 ------------
python train.py -s data/rehearsal_scene -m runs/rehearsal_stage2 \
  -t neilf --eval -c runs/rehearsal_stage1/ply/point_cloud_6000.ply \
  --resume --sample_num 24 \
  --lambda_mask_entropy 0.1 --lambda_normal_render_depth 0.01 \
  --save_interval 1000 --test_interval 1000 --log_interval 100 \
  --iterations 2000 --capacity 131072 || exit 1

echo REHEARSAL-COMPLETE
