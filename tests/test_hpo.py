"""HPO conditional search-space DSL tests (reference hp_tuning.py:30-77)."""
import numpy as np
import pytest

from pmgt_tpu.cli.hpo import RandomTrial, TrialPruned, get_hp_params


def trial(seed=0):
    return RandomTrial(0, np.random.default_rng(seed))


def test_basic_suggestions():
    space = {
        "a": {"type": "categorical", "value": [1, 2, 3]},
        "b": {"type": "int", "value": [5, 9]},
        "c": {"type": "float", "value": [0.0, 1.0]},
        "d": {"type": "static", "value": "fixed"},
    }
    p = get_hp_params(trial(), space)
    assert p["a"] in (1, 2, 3)
    assert 5 <= p["b"] <= 9
    assert 0.0 <= p["c"] <= 1.0
    assert p["d"] == "fixed"


def test_float_round_and_step():
    space = {"lr": {"type": "float", "value": [0.1, 0.5], "step": 0.1, "round": 3}}
    for seed in range(10):
        p = get_hp_params(trial(seed), space)
        assert p["lr"] == pytest.approx(round(p["lr"], 3))
        grid = np.array([0.1, 0.2, 0.3, 0.4, 0.5])
        assert np.min(np.abs(grid - p["lr"])) < 1e-9


def test_conditional_eq_triggers_nested():
    space = {
        "model": {
            "type": "static",
            "value": "NeuMF-end",
            "cond": [
                {
                    "cond_type": "eq",
                    "cond_value": "NeuMF-end",
                    "cond_param": {"alpha": {"type": "static", "value": 0.5}},
                }
            ],
        }
    }
    p = get_hp_params(trial(), space)
    assert p["alpha"] == 0.5


def test_conditional_not_triggered():
    space = {
        "x": {
            "type": "static",
            "value": 1,
            "cond": [
                {
                    "cond_type": "gt",
                    "cond_value": 5,
                    "cond_param": {"y": {"type": "static", "value": 9}},
                }
            ],
        }
    }
    assert "y" not in get_hp_params(trial(), space)


@pytest.mark.parametrize(
    "cond_type,cond_value,x,fires",
    [
        ("eq", 3, 3, True),
        ("neq", 3, 4, True),
        ("gt", 3, 4, True),
        ("gte", 3, 3, True),
        ("lt", 3, 2, True),
        ("lte", 3, 3, True),
        ("in", [1, 3], 3, True),
        ("nin", [1, 3], 2, True),
        ("eq", 3, 4, False),
        ("in", [1, 3], 2, False),
    ],
)
def test_all_cond_types(cond_type, cond_value, x, fires):
    space = {
        "x": {
            "type": "static",
            "value": x,
            "cond": [
                {
                    "cond_type": cond_type,
                    "cond_value": cond_value,
                    "cond_param": {"flag": {"type": "static", "value": True}},
                }
            ],
        }
    }
    p = get_hp_params(trial(), space)
    assert ("flag" in p) == fires


def test_prune_condition():
    space = {
        "x": {
            "type": "static",
            "value": 10,
            "cond": [{"cond_type": "gte", "cond_value": 5, "prune": True}],
        }
    }
    with pytest.raises(TrialPruned):
        get_hp_params(trial(), space)


def test_nested_conditionals():
    space = {
        "a": {
            "type": "static",
            "value": 1,
            "cond": [
                {
                    "cond_type": "eq",
                    "cond_value": 1,
                    "cond_param": {
                        "b": {
                            "type": "static",
                            "value": 2,
                            "cond": [
                                {
                                    "cond_type": "eq",
                                    "cond_value": 2,
                                    "cond_param": {
                                        "c": {"type": "static", "value": 3}
                                    },
                                }
                            ],
                        }
                    },
                }
            ],
        }
    }
    p = get_hp_params(trial(), space)
    assert p == {"a": 1, "b": 2, "c": 3}


def test_random_search_study(tmp_path):
    from pmgt_tpu.cli.hpo import RandomSearchStudy

    storage = str(tmp_path / "db")
    study = RandomSearchStudy(storage, "s1", "maximize")

    def objective(trial):
        x = trial.suggest_float("x", 0.0, 1.0)
        return x

    study.optimize(objective, n_trials=5)
    assert len(study.trials) == 5
    best = study.best_trial
    assert best["value"] == max(t["value"] for t in study.trials)

    # persistence: reloading keeps trials
    study2 = RandomSearchStudy(storage, "s1", "maximize")
    assert len(study2.trials) == 5


def test_tpe_concentrates_on_good_region(tmp_path):
    """With enough history, the built-in study's suggestions concentrate
    near the optimum of a 1-D quadratic objective."""
    from pmgt_tpu.cli.hpo import RandomSearchStudy

    study = RandomSearchStudy(str(tmp_path / "db"), "tpe", "maximize", seed=7)

    def objective(trial):
        x = trial.suggest_float("x", 0.0, 1.0)
        return -((x - 0.7) ** 2)

    study.optimize(objective, n_trials=40)
    done = sorted(study.trials, key=lambda t: t["number"])
    early = [t["params"]["x"] for t in done[:8]]
    late = [t["params"]["x"] for t in done[-15:]]
    # late-phase suggestions sit closer to the optimum on average
    assert abs(np.mean(late) - 0.7) < abs(np.mean(early) - 0.7) + 0.05
    assert np.mean([abs(x - 0.7) for x in late]) < 0.25


def test_tpe_handles_conditional_param_gaps(tmp_path):
    """Params that only exist in some trials (conditional DSL) must not
    break history-aware suggestion."""
    from pmgt_tpu.cli.hpo import RandomSearchStudy

    study = RandomSearchStudy(str(tmp_path / "db"), "cond", "maximize", seed=11)

    def objective(trial):
        kind = trial.suggest_categorical("kind", ["a", "b"])
        if kind == "a":
            return trial.suggest_float("xa", 0.0, 1.0)
        return 0.5 * trial.suggest_float("xb", 0.0, 1.0)

    study.optimize(objective, n_trials=30)
    assert len([t for t in study.trials if t["state"] == "COMPLETE"]) == 30


def test_always_pruning_space_terminates(tmp_path):
    """A conditional space whose arms always fire ``prune: true``
    (e.g. the ported hpo_ncf_mlp_pmgt_params.yaml coupling) must not loop
    forever: PRUNED trials count toward a total-attempt cap."""
    from pmgt_tpu.cli.hpo import RandomSearchStudy, get_hp_params

    study = RandomSearchStudy(str(tmp_path / "db"), "prune", "maximize", seed=3)
    space = {
        "x": {
            "type": "static",
            "value": 10,
            "cond": [{"cond_type": "gte", "cond_value": 5, "prune": True}],
        }
    }

    def objective(trial):
        get_hp_params(trial, space)  # always raises TrialPruned
        return 0.0

    study.optimize(objective, n_trials=4)  # default cap = 10 * n_trials
    assert len(study.trials) == 40
    assert all(t["state"] == "PRUNED" for t in study.trials)
    with pytest.raises(ValueError, match="no completed trials"):
        study.best_trial


def test_mostly_pruning_space_still_collects_completes(tmp_path):
    """PRUNED trials don't count toward the COMPLETE target."""
    from pmgt_tpu.cli.hpo import RandomSearchStudy, TrialPruned

    study = RandomSearchStudy(str(tmp_path / "db"), "mix", "maximize", seed=5)

    def objective(trial):
        x = trial.suggest_float("x", 0.0, 1.0)
        if x < 0.5:
            raise TrialPruned
        return x

    study.optimize(objective, n_trials=6)
    done = [t for t in study.trials if t["state"] == "COMPLETE"]
    assert len(done) == 6
    assert len(study.trials) > 6  # some attempts were pruned
