"""Exercise the Optuna-backed HPO branch (cli/hpo.py HAVE_OPTUNA=True).

optuna is not installed in this environment, so the branch mirrored from
the reference (hp_tuning.py:129-179 — create_study on sqlite storage,
max-trial stop callback, TrialPruned flow, best_trial reporting) would
otherwise never execute. A minimal in-test optuna implementing the exact
API surface the driver uses is injected into sys.modules and the module
is reloaded; the full hp-tuning command then runs real trials end to end
through it.
"""
import importlib
import json
import sys
import types

import numpy as np
import pytest


def _make_fake_optuna():
    optuna = types.ModuleType("optuna")

    class TrialPruned(Exception):
        pass

    class TrialState:
        COMPLETE = "COMPLETE"
        RUNNING = "RUNNING"
        PRUNED = "PRUNED"

    class _Trial:
        def __init__(self, number, rng):
            self.number = number
            self.params = {}
            self.state = TrialState.RUNNING
            self.value = None
            self._rng = rng

        def suggest_categorical(self, name, choices):
            v = choices[int(self._rng.integers(len(choices)))]
            self.params[name] = v
            return v

        def suggest_float(self, name, low, high, step=None, log=False):
            if step:
                n = int((high - low) / step) + 1
                v = low + step * int(self._rng.integers(n))
            else:
                v = float(self._rng.uniform(low, high))
            self.params[name] = v
            return v

        def suggest_int(self, name, low, high):
            v = int(self._rng.integers(low, high + 1))
            self.params[name] = v
            return v

        def report(self, value, step):
            pass

        def should_prune(self):
            return False

    class _Study:
        def __init__(self, study_name, storage, direction):
            self.study_name = study_name
            self.storage = storage
            self.direction = direction
            self.trials = []
            self._stopped = False
            self._rng = np.random.default_rng(0)

        def optimize(self, objective, callbacks=()):
            while not self._stopped:
                t = _Trial(len(self.trials), self._rng)
                self.trials.append(t)
                try:
                    t.value = float(objective(t))
                    t.state = TrialState.COMPLETE
                except TrialPruned:
                    t.state = TrialState.PRUNED
                for cb in callbacks:
                    cb(self, t)

        def stop(self):
            self._stopped = True

        @property
        def best_trial(self):
            done = [t for t in self.trials if t.state == TrialState.COMPLETE]
            return max(
                done,
                key=lambda t: t.value if self.direction == "maximize" else -t.value,
            )

    created = {}

    def create_study(study_name, storage, load_if_exists, direction):
        created["args"] = dict(
            study_name=study_name,
            storage=storage,
            load_if_exists=load_if_exists,
            direction=direction,
        )
        study = _Study(study_name, storage, direction)
        created["study"] = study
        return study

    optuna.TrialPruned = TrialPruned
    optuna.create_study = create_study
    optuna.trial = types.SimpleNamespace(TrialState=TrialState)
    optuna._created = created
    return optuna


@pytest.fixture
def fake_optuna(monkeypatch):
    fake = _make_fake_optuna()
    monkeypatch.setitem(sys.modules, "optuna", fake)
    import pmgt_tpu.cli.hpo as hpo_mod

    importlib.reload(hpo_mod)
    assert hpo_mod.HAVE_OPTUNA
    yield fake, hpo_mod
    # restore the optuna-less module state for the rest of the suite
    monkeypatch.delitem(sys.modules, "optuna", raising=False)
    sys.modules.pop("optuna", None)
    importlib.reload(hpo_mod)


def test_optuna_branch_runs_trials_end_to_end(tmp_path, fake_optuna):
    fake, hpo_mod = fake_optuna
    from click.testing import CliRunner

    from pmgt_tpu.cli.main import cli
    from pmgt_tpu.data.artifacts import save_native
    from pmgt_tpu.data.synthetic import make_synthetic_dataset

    art = make_synthetic_dataset(
        num_nodes=60, num_users=40, feat_dims=(12, 8), seed=0
    )
    save_native(str(tmp_path / "data" / "S"), art)

    space = {
        "lr": {"type": "categorical", "value": [1e-3, 5e-3]},
        "factor_num": {
            "type": "categorical",
            "value": [4, 8],
            "cond": [
                {"cond_type": "eq", "cond_value": 4, "prune": True},
            ],
        },
    }
    (tmp_path / "space.json").write_text(json.dumps(space))
    train_cfg = {
        "model_name": "GMF",
        "dataset_name": "S",
        "seed": 0,
        "num_epochs": 1,
        "early": 1,
        "early_criterion": "n20",
        "train_batch_size": 32,
        "test_batch_size": 32,
        "num_ng": 1,
        "max_sample_items": 20,
        "data_dir": str(tmp_path / "data"),
        "log_dir": str(tmp_path / "logs"),
        "experiment_name": "hpo-optuna",
    }
    (tmp_path / "train.json").write_text(json.dumps(train_cfg))

    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "hp-tuning",
            "--hp-config-path", str(tmp_path / "space.json"),
            "--train-config-path", str(tmp_path / "train.json"),
            "--train-name", "ncf",
            "--n-trials", "2",
            "--study-name", "fake-study",
            "--storage-path", str(tmp_path / "hpo" / "storage.db"),
        ],
        obj={},
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output

    # the sqlite storage contract from the reference is preserved
    assert fake._created["args"]["storage"].startswith("sqlite:///")
    assert fake._created["args"]["direction"] == "maximize"
    assert fake._created["args"]["load_if_exists"] is True

    # pruned factor_num==4 combos surface as PRUNED, completed ones as
    # COMPLETE, and the max-trial stop callback ended the study after
    # n_trials completed+running trials
    study = fake._created["study"]
    states = [t.state for t in study.trials]
    assert states.count("COMPLETE") >= 1
    completed = [t for t in study.trials if t.state == "COMPLETE"]
    assert all(t.params["factor_num"] == 8 for t in completed)
    pruned = [t for t in study.trials if t.state == "PRUNED"]
    assert all(t.params["factor_num"] == 4 for t in pruned)
    assert study._stopped
    assert study.best_trial.value is not None
