#!/bin/bash
# Train the 5 Tanks&Temples scenes sequentially
# (reference tools/launch_all_tanks_and_temple_training.sh:1-7).
set -e
DATA=${IFFNERF_DATA:-./data/TanksAndTemple}
for obj in Barn Caterpillar Family Ignatius Truck; do
    python train.py --config configs/truck.txt \
        --datadir "$DATA/$obj" --expname "tensorf_${obj}_VMtt"
done
