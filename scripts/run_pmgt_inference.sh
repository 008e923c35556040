#!/usr/bin/env bash
# Export PMGT node embeddings from a trained run.
# Usage: scripts/run_pmgt_inference.sh <run_id> [out_path]
DATASET=${DATASET:-TG}; RUN_ID=$1
OUT=${2:-"./data/$DATASET/node_feat_128dim.npy"}
python main.py train-pmgt \
    --run-script "$0" --dataset-name "$DATASET" --model-name PMGT \
    --mode inference --run-id "$RUN_ID" --early-criterion auc \
    --inference-result-path "$OUT"
