#!/usr/bin/env bash
# NCF hyperparameter search with the conditional-DSL space.
python main.py hp-tuning --train-name ncf \
    --hp-config-path config/hpo/hpo_ncf_params.yaml \
    --train-config-path config/hpo/train_ncf_params.json \
    --n-trials "${1:-20}" --study-name ncf-study
