#!/usr/bin/env bash
# Published MLP-PMGT search (reference scripts/run_hpo_ncf_mlp_pmgt.sh); pass the trial
# count as $1 (default 50, the reference's n-trials).
python main.py hp-tuning --train-name ncf \
    --study-name "MLP-PMGT-study" \
    --hp-config-path config/hpo/hpo_ncf_mlp_pmgt_params.yaml \
    --train-config-path config/hpo/train_ncf_mlp_pmgt_params.json \
    --n-trials "${1:-50}"
