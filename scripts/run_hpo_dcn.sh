#!/usr/bin/env bash
# Published DCN search (reference scripts/run_hpo_dcn.sh); pass the trial
# count as $1 (default 50, the reference's n-trials).
python main.py hp-tuning --train-name dcn \
    --study-name "DCN-study" \
    --hp-config-path config/hpo/hpo_dcn_params.yaml \
    --train-config-path config/hpo/train_dcn_params.json \
    --n-trials "${1:-50}"
