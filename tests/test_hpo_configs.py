"""Every shipped HPO config must load and resolve cleanly.

- each YAML search space resolves 20 trials through ``get_hp_params``
  (pruned combinations allowed — the published PMGT-injection spaces
  encode the hidden-size <-> factor_num*2^(L-1) coupling with prune
  conditions, reference config/hpo/hpo_ncf_mlp_pmgt_params.yaml:30-120);
- every resolved value has a usable type (pyyaml parses bare-exponent
  floats like ``1e-4`` as *strings* — the ported files use 1.0e-4);
- each base JSON round-trips through ``TrainArgs.from_dict``.
"""
import glob
import json
import os

import numpy as np
import pytest

from pmgt_tpu.cli.hpo import RandomTrial, TrialPruned, get_hp_params, _load_space
from pmgt_tpu.core.config import TrainArgs

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config", "hpo")
YAMLS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))
JSONS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))


def test_config_inventory_complete():
    """All 8 published YAML spaces + 8 base JSONs (reference config/hpo)
    are shipped, plus the repo's own ncf/dcn/pmgt spaces."""
    names = {os.path.basename(p) for p in YAMLS}
    for required in [
        "hpo_dcn_params.yaml",
        "hpo_dcn_pmgt_params.yaml",
        "hpo_ncf_gmf_params.yaml",
        "hpo_ncf_mlp_params.yaml",
        "hpo_ncf_mlp_pmgt_params.yaml",
        "hpo_ncf_neumf_end_params.yaml",
        "hpo_ncf_neumf_pmgt_params.yaml",
        "hpo_ncf_neumf_pre_params.yaml",
    ]:
        assert required in names, f"missing search space {required}"
    json_names = {os.path.basename(p) for p in JSONS}
    for required in [
        "train_dcn_params.json",
        "train_dcn_pmgt_params.json",
        "train_ncf_gmf_params.json",
        "train_ncf_mlp_params.json",
        "train_ncf_mlp_pmgt_params.json",
        "train_ncf_neumf_end_params.json",
        "train_ncf_neumf_pmgt_params.json",
        "train_ncf_neumf_pre_params.json",
    ]:
        assert required in json_names, f"missing base config {required}"


def _check_types(resolved):
    for key, value in resolved.items():
        assert not isinstance(value, dict), (key, value)
        if isinstance(value, str):
            # catch pyyaml's silent float->str parses
            assert not value.replace(".", "").replace("-", "").replace(
                "e", ""
            ).isdigit() or key.endswith("_id"), (
                f"{key} resolved to numeric-looking string {value!r}"
            )


@pytest.mark.parametrize("path", YAMLS, ids=os.path.basename)
def test_yaml_space_resolves_20_trials(path):
    space = _load_space(path)
    rng = np.random.default_rng(0)
    completed = pruned = 0
    for n in range(20):
        trial = RandomTrial(n, rng)
        try:
            resolved = get_hp_params(trial, space)
        except TrialPruned:
            pruned += 1
            continue
        completed += 1
        assert resolved
        _check_types(resolved)
        for key in ("lr", "dropout", "emb_dropout", "decay", "alpha"):
            if key in resolved:
                assert isinstance(resolved[key], float), (key, resolved[key])
    assert completed > 0, f"all 20 trials pruned for {path}"


def test_pmgt_injection_coupling_holds():
    """Whenever the mlp_pmgt space resolves an item_init_emb_path, its
    dimension (…_<H>dim.npy) must equal factor_num * 2^(num_layers-1)."""
    import re

    space = _load_space(
        os.path.join(CONFIG_DIR, "hpo_ncf_mlp_pmgt_params.yaml")
    )
    rng = np.random.default_rng(1)
    seen = 0
    for n in range(200):
        trial = RandomTrial(n, rng)
        try:
            resolved = get_hp_params(trial, space)
        except TrialPruned:
            continue
        path = resolved.get("item_init_emb_path")
        if path is None:
            continue
        seen += 1
        dim = int(re.search(r"_(\d+)dim\.npy$", path).group(1))
        expected = resolved["factor_num"] * 2 ** (resolved["num_layers"] - 1)
        assert dim == expected, resolved
    assert seen >= 20  # the coupling branch is actually exercised


@pytest.mark.parametrize("path", JSONS, ids=os.path.basename)
def test_base_json_roundtrips_through_train_args(path):
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    args = TrainArgs.from_dict(raw)
    assert args.model_name == raw["model_name"]
    assert args.lr == raw["lr"]
    # workload keys land in extra and stay retrievable attr-style
    if "factor_num" in raw:
        assert args.factor_num == raw["factor_num"]
    # round trip preserves everything the dataclass knows about
    again = TrainArgs.from_dict(args.to_dict())
    assert again.to_dict() == args.to_dict()


def test_hpo_scripts_reference_existing_configs():
    scripts = glob.glob(
        os.path.join(os.path.dirname(CONFIG_DIR), "..", "scripts", "run_hpo_*.sh")
    )
    assert len(scripts) >= 9  # 8 published + the repo's generic ncf search
    for s in scripts:
        text = open(s, encoding="utf-8").read()
        for m in __import__("re").findall(r"config/hpo/(\S+)", text):
            assert os.path.exists(os.path.join(CONFIG_DIR, m)), (s, m)
