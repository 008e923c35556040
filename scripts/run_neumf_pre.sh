#!/usr/bin/env bash
# NeuMF-pre: fuse trained GMF + MLP runs.
# Usage: scripts/run_neumf_pre.sh <seed> <gmf_run_id> <mlp_run_id>
DATASET=${DATASET:-TG}; SEED=${1:-0}
python main.py train-ncf \
    --run-script "$0" --dataset-name "$DATASET" --model-name NeuMF-pre \
    --lr 1e-4 --decay 0 --factor-num 64 --num-layers 2 --num-ng 1 \
    --num-epochs 60 --train-batch-size 128 --test-batch-size 256 \
    --early-criterion n20 --seed "$SEED" --early 10 --mp-enabled \
    --gradient-max-norm 5.0 --experiment-name NeuMF-pre --run-name NeuMF-pre \
    --gmf-run-id "$2" --mlp-run-id "$3" --alpha 0.5
