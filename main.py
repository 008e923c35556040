#!/usr/bin/env python
"""Top-level CLI entry point (reference main.py equivalent).

Usage:
    python main.py train-pmgt --dataset-name TG --model-name PMGT ...
    python main.py train-ncf  --dataset-name VG --model-name NeuMF-end ...
    python main.py train-dcn  --dataset-name TG --model-name DCN ...
    python main.py hp-tuning  --hp-config-path ... --train-config-path ...
    python main.py make-synthetic --out-dir ./data/synthetic
"""
from pmgt_tpu.cli.main import cli  # noqa: F401  (registers train commands)
from pmgt_tpu.cli.hpo import hp_tuning  # noqa: F401  (registers hp-tuning)
from pmgt_tpu.cli.data_cmds import make_synthetic, preprocess  # noqa: F401

if __name__ == "__main__":
    cli(obj={})
