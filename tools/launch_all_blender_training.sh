#!/bin/bash
# Train all 8 NeRF-synthetic objects sequentially
# (reference tools/launch_all_blender_training.sh:1-9).
set -e
DATA=${IFFNERF_DATA:-./data/nerf_synthetic}
for obj in chair drums ficus hotdog lego materials mic ship; do
    python train.py --config configs/lego.txt \
        --datadir "$DATA/$obj" --expname "tensorf_${obj}_VM"
done
