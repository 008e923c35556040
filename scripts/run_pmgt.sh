#!/usr/bin/env bash
# PMGT pre-training with the published hyperparameters
# (reference scripts/run_pmgt.sh). Usage: scripts/run_pmgt.sh <seed>

DATASET=${DATASET:-TG}
SEED=${1:-0}

args=(
    --run-script "$0"
    --dataset-name "$DATASET"
    --model-name PMGT
    --lr 1e-4
    --decay 1e-2
    --num-epochs 30
    --train-batch-size 32
    --test-batch-size 64
    --early-criterion auc
    --seed "$SEED"
    --early 5
    --hidden-size 32
    --num-hidden-layers 3
    --beta 1.0
    --valid-size 0.1
    --gradient-max-norm 5.0
    --mp-enabled
    --attention-impl pallas
    --experiment-name PMGT
    --run-name PMGT
)

python main.py train-pmgt "${args[@]}"

# After training, export node embeddings for the downstream models:
#   python main.py train-pmgt --dataset-name $DATASET --model-name PMGT \
#       --mode inference --run-id <run_id> \
#       --inference-result-path "./data/$DATASET/node_feat3_32dim.npy"
