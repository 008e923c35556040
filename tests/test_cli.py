"""CLI tests: --save-args, train_model dispatch, hp-tuning smoke with the
built-in random-search backend."""
import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

from pmgt_tpu.data.artifacts import save_native
from pmgt_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_data")
    art = make_synthetic_dataset(
        num_nodes=40, num_users=40, feat_dims=(8, 6), avg_degree=6, seed=11
    )
    save_native(str(tmp / "SYN"), art)
    return str(tmp)


def _cli():
    import main  # registers all commands on the group

    from pmgt_tpu.cli.main import cli

    return cli


def test_save_args_writes_json_without_training(tmp_path):
    runner = CliRunner()
    out = str(tmp_path / "args.json")
    result = runner.invoke(
        _cli(),
        [
            "--save-args",
            out,
            "train-ncf",
            "--model-name",
            "GMF",
            "--dataset-name",
            "VG",
            "--factor-num",
            "16",
        ],
        obj={},
    )
    assert result.exit_code == 0, result.output
    with open(out, encoding="utf-8") as f:
        saved = json.load(f)
    assert saved["model_name"] == "GMF"
    assert saved["factor_num"] == 16
    assert saved["dataset_name"] == "VG"


def test_train_ncf_cli_end_to_end(dataset_dir, tmp_path):
    runner = CliRunner()
    result = runner.invoke(
        _cli(),
        [
            "train-ncf",
            "--model-name",
            "GMF",
            "--dataset-name",
            "SYN",
            "--data-dir",
            dataset_dir,
            "--log-dir",
            str(tmp_path / "logs"),
            "--num-epochs",
            "1",
            "--train-batch-size",
            "32",
            "--factor-num",
            "8",
            "--early-criterion",
            "n20",
            "--max-sample-items",
            "20",
        ],
        obj={},
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    # one FINISHED run exists
    exp_dir = tmp_path / "logs" / "baseline"
    runs = os.listdir(exp_dir)
    assert len(runs) == 1
    with open(exp_dir / runs[0] / "status", encoding="utf-8") as f:
        assert f.read().strip() == "FINISHED"


def test_hp_tuning_random_search(dataset_dir, tmp_path):
    """2 trials through the full objective with the fallback backend."""
    runner = CliRunner()
    hp = tmp_path / "space.json"
    hp.write_text(
        json.dumps(
            {
                "lr": {"type": "float", "value": [1e-3, 1e-2], "round": 5},
                "factor_num": {"type": "categorical", "value": [4, 8]},
            }
        )
    )
    base = tmp_path / "base.json"
    base.write_text(
        json.dumps(
            {
                "seed": 0,
                "model_name": "GMF",
                "dataset_name": "SYN",
                "data_dir": dataset_dir,
                "log_dir": str(tmp_path / "logs"),
                "num_epochs": 1,
                "train_batch_size": 32,
                "test_batch_size": 128,
                "early": 2,
                "early_criterion": "n20",
                "max_sample_items": 20,
                "num_ng": 1,
                "tags": [],
            }
        )
    )
    result = runner.invoke(
        _cli(),
        [
            "hp-tuning",
            "--hp-config-path",
            str(hp),
            "--train-config-path",
            str(base),
            "--n-trials",
            "2",
            "--train-name",
            "ncf",
            "--storage-path",
            str(tmp_path / "hpo" / "storage.db"),
            "--study-name",
            "smoke",
        ],
        obj={},
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    trials_file = tmp_path / "hpo" / "smoke_trials.json"
    with open(trials_file, encoding="utf-8") as f:
        trials = json.load(f)
    complete = [t for t in trials if t["state"] == "COMPLETE"]
    assert len(complete) >= 2
    for t in complete:
        assert "lr" in t["params"] and "factor_num" in t["params"]
        assert t["value"] is not None


def test_runs_command_lists_and_details(tmp_path):
    """`runs` browses the registry: table of runs + per-run detail."""
    from pmgt_tpu.train.registry import RunRegistry

    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run(
        "expA", {"model_name": "GMF", "dataset_name": "VG", "lr": 1e-3}
    )
    registry.log_metrics(run, {"val/loss": 0.5, "loss/train": 0.9}, step=10, epoch=0)
    registry.set_status(run, "FINISHED")
    run2 = registry.create_run("expB", {"model_name": "DCN", "dataset_name": "TG"})

    runner = CliRunner()
    result = runner.invoke(
        _cli(), ["runs", "--log-dir", str(tmp_path / "logs")], obj={}
    )
    assert result.exit_code == 0, result.output
    assert run.run_id in result.output and run2.run_id in result.output
    assert "FINISHED" in result.output and "RUNNING" in result.output

    result = runner.invoke(
        _cli(),
        ["runs", "--log-dir", str(tmp_path / "logs"), "--experiment-name", "expA"],
        obj={},
    )
    assert run.run_id in result.output and run2.run_id not in result.output

    result = runner.invoke(
        _cli(),
        ["runs", "--log-dir", str(tmp_path / "logs"), "--run-id", run.run_id],
        obj={},
    )
    assert result.exit_code == 0, result.output
    assert "model_name = GMF" in result.output
    assert "val/loss = 0.5" in result.output


def test_downstream_eval_inference_require_run_id():
    """eval/inference without --run-id would score freshly initialized
    params (nothing trains in those modes) — every downstream workload
    fails loudly, mirroring pmgt_task.check_args."""
    import pytest

    from pmgt_tpu.core.config import TrainArgs
    from pmgt_tpu.tasks import dcn_task, ncf_task, pmgt_ncf_task

    for mod, model_name in (
        (ncf_task, "NeuMF-end"),
        (dcn_task, "DCN"),
        (pmgt_ncf_task, "NeuMF-end"),
    ):
        for mode in ("eval", "inference"):
            crit = "auc" if model_name == "DCN" else "n20"
            args = TrainArgs(
                model_name=model_name, dataset_name="x", mode=mode,
                early_criterion=crit,
            )
            with pytest.raises(ValueError, match="requires --run-id"):
                mod.check_args(args)


def test_make_synthetic_signal_requires_shape(tmp_path):
    """--signal scales the published-shape generator's graph→interaction
    coupling; on the count-parameterized generator it would silently do
    nothing, so the CLI rejects it."""
    runner = CliRunner()
    result = runner.invoke(
        _cli(),
        ["make-synthetic", "--out-dir", str(tmp_path / "d"),
         "--num-nodes", "30", "--num-users", "20", "--signal", "0.5"],
        obj={},
    )
    assert result.exit_code != 0
    assert "--signal applies only to --shape" in result.output
