#!/usr/bin/env bash
# MLP baseline (stage 1 for NeuMF-pre). Usage: scripts/run_mlp.sh <seed>
DATASET=${DATASET:-TG}; SEED=${1:-0}
python main.py train-ncf \
    --run-script "$0" --dataset-name "$DATASET" --model-name MLP \
    --lr 1e-3 --decay 0 --factor-num 64 --num-layers 2 --num-ng 1 \
    --num-epochs 60 --train-batch-size 128 --test-batch-size 256 \
    --early-criterion n20 --seed "$SEED" --early 10 --mp-enabled \
    --gradient-max-norm 5.0 --experiment-name MLP --run-name MLP
