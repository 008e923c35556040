"""Drive the PMGT PRE-TRAINING HPO search space through REAL trials on
the TPU at TG shape (VERDICT r4 #7) — the one space family never
executed on device (the heaviest per-trial objective: a full PMGT
pretrain per trial, hidden/intermediate couplings, beta and
mask-node-ratio, pruning against val AUC).

The space under test is the ported `config/hpo/hpo_pmgt_params.yaml`
(reference `config/hpo/hpo_pmgt_params.yaml` / `hp_tuning.py:92-110`):
lr (log-ish float), beta steps, the hidden_size categorical whose
conditional arms pin intermediate_size, num_hidden_layers, and
mask_node_ratio. No placeholder substitutions are needed — the space is
self-contained.

Stages (user-facing CLI, one subprocess each):
  1. TG-shape synthetic dataset at the calibrated signal
  2. `hp-tuning --train-name pmgt --enable-trial-pruning` until the
     study holds >= MIN_COMPLETE COMPLETE and >= MIN_PRUNED PRUNED
     trials (bounded extension)
  3. best-trial restore: eval mode on the best trial's registry run
  4. write HPO_TG_PMGT.json (trials + best + restore eval)

Usage: python tools/hpo_pmgt_study.py [--work /tmp/hpo_pmgt] [--n-trials 4]
"""
import argparse
import copy
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MIN_COMPLETE = 3
MIN_PRUNED = 1


def run_cli(args):
    cmd = [sys.executable, os.path.join(REPO, "main.py")] + [
        str(a) for a in args
    ]
    print("+", " ".join(cmd), flush=True)
    res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stdout[-4000:])
        print(res.stderr[-4000:])
        raise RuntimeError(f"CLI failed: {args[0]} (exit {res.returncode})")
    return res.stdout + res.stderr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/hpo_pmgt")
    ap.add_argument("--n-trials", type=int, default=4)
    ap.add_argument("--signal", type=float, default=None)
    ap.add_argument("--trial-epochs", type=int, default=6)
    ap.add_argument("--out", default=os.path.join(REPO, "HPO_TG_PMGT.json"))
    args = ap.parse_args()

    if args.signal is None:
        # single source of truth: the gate's calibrated per-shape signal
        from pmgt_tpu.data.synthetic import CALIBRATED_SIGNAL

        args.signal = CALIBRATED_SIGNAL["TG"]

    work = os.path.abspath(args.work)
    data_dir = os.path.join(work, "data")
    log_dir = os.path.join(work, "logs")
    os.makedirs(work, exist_ok=True)
    report = {"work": work, "signal": args.signal, "stages": []}

    tg_dir = os.path.join(data_dir, "TG")
    if not os.path.exists(os.path.join(tg_dir, "meta.json")):
        run_cli(["make-synthetic", "--out-dir", tg_dir, "--shape", "TG",
                 "--seed", 42, "--signal", args.signal])
    report["stages"].append({"stage": "dataset", "path": tg_dir})

    # Trial-budget train params on top of the ported defaults.
    with open(os.path.join(REPO, "config/hpo/train_pmgt_params.json"),
              encoding="utf-8") as f:
        train_params = json.load(f)
    train_params.update(
        dataset_name="TG", data_dir=data_dir, log_dir=log_dir,
        num_epochs=args.trial_epochs, early=3,
        train_batch_size=256, test_batch_size=512,
        experiment_name="PMGT-HPO-TG",
    )
    params_path = os.path.join(work, "train_pmgt_params.TG.json")
    with open(params_path, "w", encoding="utf-8") as f:
        json.dump(train_params, f, indent=2)

    space_path = os.path.join(REPO, "config/hpo/hpo_pmgt_params.yaml")
    storage = os.path.join(work, "hpo_storage.db")
    trials_path = os.path.join(work, "pmgt_tg_trials.json")

    def study_counts():
        if not os.path.exists(trials_path):
            return 0, 0
        with open(trials_path, encoding="utf-8") as f:
            trials = json.load(f)
        return (
            sum(t["state"] == "COMPLETE" for t in trials),
            sum(t["state"] == "PRUNED" for t in trials),
        )

    target = args.n_trials
    for _ in range(4):  # bounded extension until both arms are proven
        run_cli([
            "hp-tuning", "--hp-config-path", space_path,
            "--train-config-path", params_path,
            "--n-trials", target, "--study-name", "pmgt_tg",
            "--storage-path", storage, "--train-name", "pmgt",
            "--enable-trial-pruning",
        ])
        n_complete, n_pruned = study_counts()
        if n_complete >= MIN_COMPLETE and n_pruned >= MIN_PRUNED:
            break
        target += 1
    n_complete, n_pruned = study_counts()

    with open(trials_path, encoding="utf-8") as f:
        trials = json.load(f)
    report["trials"] = trials
    report["n_complete"], report["n_pruned"] = n_complete, n_pruned

    done = [t for t in trials if t["state"] == "COMPLETE"]
    if not done:
        # Every trial pruned/capped: still write the partial report —
        # the TPU trial budget was already spent and report["trials"]
        # holds everything needed for a post-mortem.
        report["best"] = None
        report["error"] = "no COMPLETE trials (all pruned/capped)"
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2)
        print(f"NO COMPLETE TRIALS — partial report at {args.out}")
        return
    best = max(done, key=lambda t: t["value"])
    report["best"] = copy.deepcopy(best)

    # Best-trial restore in eval mode (opt-state-shaping flags must
    # match: gradient_max_norm adds a clip link to the optax chain).
    from pmgt_tpu.train.registry import RunRegistry

    reg = RunRegistry(log_dir)
    best_run = None
    for run in reg.list_runs("PMGT-HPO-TG"):
        with open(os.path.join(run.run_dir, "tags.json"),
                  encoding="utf-8") as f:
            tags = json.load(f)
        if tags.get("trial") == str(best["number"]):
            best_run = run
            break
    if best_run is None:
        raise RuntimeError(f"no registry run tagged trial={best['number']}")

    p = best["params"]
    hidden = int(p["hidden_size"])
    out = run_cli([
        "train-pmgt", "--mode", "eval", "--run-id", best_run.run_id,
        "--model-name", "PMGT", "--dataset-name", "TG",
        "--data-dir", data_dir, "--log-dir", log_dir,
        "--hidden-size", hidden, "--intermediate-size", hidden,
        "--num-hidden-layers", int(p["num_hidden_layers"]),
        "--beta", p["beta"], "--mask-node-ratio", p["mask_node_ratio"],
        "--lr", p["lr"], "--decay", train_params["decay"],
        "--gradient-max-norm", train_params["gradient_max_norm"],
        "--mp-enabled", "--valid-size", train_params["valid_size"],
        "--early-criterion", "auc",
        "--train-batch-size", 256, "--test-batch-size", 512,
        "--seed", int(p.get("seed", train_params["seed"])),
    ])
    m = re.search(r"test results: (\{.*\})", out)
    try:
        report["best_restore_eval"] = eval(m.group(1)) if m else None  # noqa: S307
    except Exception:
        report["best_restore_eval"] = m.group(1) if m else None
    report["best_run_id"] = best_run.run_id

    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "n_complete": n_complete, "n_pruned": n_pruned,
        "best_value": best["value"], "best_params": best["params"],
        "restore_eval": report["best_restore_eval"],
    }, indent=2))


if __name__ == "__main__":
    main()
