#!/usr/bin/env bash
# NeuMF-PMGT with the published hyperparameters
# (reference scripts/run_ncf.sh). Usage: scripts/run_ncf.sh <seed>

DATASET=${DATASET:-TG}
SEED=${1:-0}

args=(
    --run-script "$0"
    --dataset-name "$DATASET"
    --model-name NeuMF-end
    --lr 1e-4
    --decay 0
    --emb-dropout 0
    --dropout 0
    --factor-num 64
    --num-layers 2
    --num-ng 1
    --num-epochs 60
    --train-batch-size 128
    --test-batch-size 256
    --early-criterion n20
    --seed "$SEED"
    --early 10
    --mp-enabled
    --gradient-max-norm 5.0
    --experiment-name NeuMF-end
    --run-name NeuMF-PMGT
    --item-init-emb-path "./data/$DATASET/node_feat_128dim.npy"
    --normalize-item-init-emb
)

python main.py train-ncf "${args[@]}"
