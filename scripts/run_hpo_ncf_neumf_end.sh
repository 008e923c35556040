#!/usr/bin/env bash
# Published NeuMF-end search (reference scripts/run_hpo_ncf_neumf_end.sh); pass the trial
# count as $1 (default 50, the reference's n-trials).
python main.py hp-tuning --train-name ncf \
    --study-name "NeuMF-end-study" \
    --hp-config-path config/hpo/hpo_ncf_neumf_end_params.yaml \
    --train-config-path config/hpo/train_ncf_neumf_end_params.json \
    --n-trials "${1:-50}"
