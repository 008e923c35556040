#!/usr/bin/env bash
# DCN-PMGT with the published hyperparameters
# (reference scripts/run_dcn.sh). Usage: scripts/run_dcn.sh <seed>

DATASET=${DATASET:-TG}
SEED=${1:-0}

args=(
    --run-script "$0"
    --dataset-name "$DATASET"
    --model-name DCN
    --lr 1e-3
    --decay 1e-3
    --emb-dropout 0.2
    --dropout 0
    --factor-num 16
    --deep-net-num-layers 1
    --cross-net-num-layers 4
    --num-ng 1
    --num-epochs 60
    --train-batch-size 128
    --test-batch-size 256
    --early-criterion auc
    --seed "$SEED"
    --early 10
    --mp-enabled
    --gradient-max-norm 5.0
    --use-layer-norm
    --experiment-name DCN
    --run-name DCN-PMGT
    --item-init-emb-path "./data/$DATASET/node_feat3_32dim.npy"
    --normalize-item-init-emb
)

python main.py train-dcn "${args[@]}"
