#!/bin/bash
# Composition + relighting recipes — analogue of `script/relighting.sh`.
# High-quality offline trace (384 samples) and fast baked variant.
set -e
cfg=${1:?config dir (transform.json / trajectory.json)}
env=${2:?hdr environment map}
out=${3:-./capture_trace}

# offline high-quality: per-splat ray-traced visibility
python relighting.py -co "$cfg" -e "$env" --sample_num 384 \
    --output "$out" --video

# fast: bake visibility into SH, fewer samples
# python relighting.py -co "$cfg" -e "$env" --sample_num 24 --bake \
#     --output "${out}_baked"
