#!/usr/bin/env bash
# End-to-end PMGT_NCF (PMGT item tower inside NCF).
# Usage: scripts/run_pmgt_ncf.sh <seed>
DATASET=${DATASET:-TG}; SEED=${1:-0}
python main.py train-pmgt-ncf \
    --run-script "$0" --dataset-name "$DATASET" --model-name NeuMF-end \
    --lr 1e-4 --factor-num 64 --num-layers 2 --num-ng 1 \
    --hidden-size 128 --num-hidden-layers 5 \
    --num-epochs 30 --train-batch-size 128 --test-batch-size 256 \
    --early-criterion n20 --seed "$SEED" --early 5 --mp-enabled \
    --gradient-max-norm 5.0 --experiment-name PMGT_NCF --run-name PMGT_NCF
