"""Drive the reference's conditional MLP-PMGT HPO search space through
REAL trials on the TPU at TG shape (VERDICT r3 #6).

The space under test is the ported `config/hpo/hpo_ncf_mlp_pmgt_params.yaml`
(reference `config/hpo/hpo_ncf_mlp_pmgt_params.yaml:30-120`): the
`factor_num` x `num_layers` grid whose arms either PRUNE the trial or
couple `item_init_emb_path` to the PMGT export whose dim matches the MLP
input width (8x3->32, 8x4/16x3->64, 8x5/16x4/32x3->128, ...), plus a
`gmf_run_id` categorical in the factor_num=32 arm. Per the YAML header,
npy paths and run ids are placeholders the user substitutes — this
driver substitutes REAL ones it builds first.

Stages (all via the user-facing CLI, one subprocess each):
  1. TG-shape synthetic dataset (calibrated signal) -> native artifacts
  2. PMGT pretrains at hidden 32/64/128 -> three embedding exports
  3. one GMF run (the non-null `gmf_run_id` arm)
  4. substitute into the YAML, run `hp-tuning --enable-trial-pruning`
     until the study holds >=1 PRUNED and >=MIN_COMPLETE COMPLETE trials
  5. best-trial restore: eval mode on the best trial's registry run
  6. write HPO_TG_MLP_PMGT.json (trials + best + restore eval)

Usage:  python tools/hpo_tg_study.py [--work /tmp/hpo_tg] [--n-trials 5]
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

# (factor_num, num_layers) -> embedding dim for every non-pruned arm
# (MLP input width = factor_num * 2**(num_layers-1), reference YAML comments)
ARM_DIM = {
    (8, 3): 32, (8, 4): 64, (8, 5): 128,
    (16, 2): 32, (16, 3): 64, (16, 4): 128,
    (32, 2): 64, (32, 3): 128,
}
MIN_COMPLETE = 4
MIN_PRUNED = 1


def run_cli(args, **env_over):
    cmd = [sys.executable, os.path.join(REPO, "main.py")] + [str(a) for a in args]
    print("+", " ".join(cmd), flush=True)
    env = dict(os.environ, **{k: str(v) for k, v in env_over.items()})
    res = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stdout[-4000:])
        print(res.stderr[-4000:])
        raise RuntimeError(f"CLI failed: {args[0]} (exit {res.returncode})")
    return res.stdout + res.stderr


def last_run_id(out):
    ids = re.findall(r"run_id: ([0-9a-f]{32})", out)
    if not ids:
        raise RuntimeError("no run_id in CLI output")
    return ids[-1]


def pretrain_and_export(data_dir, log_dir, hidden, epochs):
    out = run_cli([
        "train-pmgt", "--model-name", "PMGT", "--dataset-name", "TG",
        "--data-dir", data_dir, "--log-dir", log_dir,
        "--num-epochs", epochs, "--train-batch-size", 256,
        "--test-batch-size", 512, "--lr", 1e-4, "--decay", 1e-2,
        "--early", 5, "--early-criterion", "auc", "--mp-enabled",
        "--gradient-max-norm", 5.0, "--ckpt-interval", 1000000,
        "--hidden-size", hidden, "--intermediate-size", hidden,
        "--num-hidden-layers", 5,
        "--experiment-name", f"PMGT-h{hidden}",
    ])
    rid = last_run_id(out)
    emb = os.path.join(data_dir, "TG", f"node_feat_{hidden}dim.npy")
    # the restore template rebuilds the optimizer state, so every
    # opt-state-shaping flag must match the training invocation
    # (gradient_max_norm adds a clip link to the optax chain)
    run_cli([
        "train-pmgt", "--model-name", "PMGT", "--dataset-name", "TG",
        "--data-dir", data_dir, "--log-dir", log_dir,
        "--hidden-size", hidden, "--intermediate-size", hidden,
        "--num-hidden-layers", 5, "--mp-enabled",
        "--lr", 1e-4, "--decay", 1e-2, "--gradient-max-norm", 5.0,
        "--mode", "inference", "--run-id", rid,
        "--inference-result-path", emb,
    ])
    return rid, emb


def substitute_space(emb_paths, gmf_run_id):
    import yaml

    with open(os.path.join(REPO, "config/hpo/hpo_ncf_mlp_pmgt_params.yaml"),
              encoding="utf-8") as f:
        space = yaml.safe_load(f)

    def walk(node):
        if isinstance(node, dict):
            if node.get("type") == "static" and isinstance(node.get("value"), str):
                m = re.search(r"(\d+)dim\.npy$", node["value"])
                if m:
                    node["value"] = emb_paths[int(m.group(1))]
            for k, v in node.items():
                if k == "value" and isinstance(v, list):
                    node[k] = [
                        gmf_run_id if isinstance(x, str) and re.fullmatch(r"[0-9a-f]{32}", x)
                        else x
                        for x in v
                    ]
                else:
                    walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(space)
    return space


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/hpo_tg")
    ap.add_argument("--n-trials", type=int, default=5)
    ap.add_argument("--signal", type=float, default=None,
                    help="default: the calibrated TG value")
    ap.add_argument("--pretrain-epochs", type=int, default=8)
    ap.add_argument("--trial-epochs", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(REPO, "HPO_TG_MLP_PMGT.json"))
    args = ap.parse_args()

    if args.signal is None:
        # the calibrated per-shape signal (single source of truth)
        import importlib.util

        spec = importlib.util.find_spec("yaml")  # noqa: F841 (sanity)
        sys.argv = [sys.argv[0]]
        cal = {}
        with open(os.path.join(REPO, "tools/validate_pipeline.py"),
                  encoding="utf-8") as f:
            for line in f:
                m = re.match(r"CALIBRATED_SIGNAL = (\{.*\})", line.strip())
                if m:
                    cal = eval(m.group(1))  # noqa: S307 (literal dict)
        args.signal = cal.get("TG", 1.0)

    work = os.path.abspath(args.work)
    data_dir = os.path.join(work, "data")
    log_dir = os.path.join(work, "logs")
    os.makedirs(work, exist_ok=True)
    report = {"work": work, "signal": args.signal, "stages": []}

    # 1. dataset
    tg_dir = os.path.join(data_dir, "TG")
    if not os.path.exists(os.path.join(tg_dir, "meta.json")):
        run_cli(["make-synthetic", "--out-dir", tg_dir, "--shape", "TG",
                 "--seed", 42, "--signal", args.signal])
    report["stages"].append({"stage": "dataset", "path": tg_dir})

    # 2. PMGT pretrains + exports (the three dims the space couples to)
    emb_paths = {}
    for hidden in (32, 64, 128):
        marker = os.path.join(tg_dir, f"node_feat_{hidden}dim.npy")
        if os.path.exists(marker):
            emb_paths[hidden] = marker
            continue
        rid, emb = pretrain_and_export(
            data_dir, log_dir, hidden, args.pretrain_epochs
        )
        emb_paths[hidden] = emb
        report["stages"].append(
            {"stage": f"pretrain_h{hidden}", "run_id": rid, "emb": emb}
        )

    # 3. GMF run for the gmf_run_id arm
    out = run_cli([
        "train-ncf", "--model-name", "GMF", "--dataset-name", "TG",
        "--data-dir", data_dir, "--log-dir", log_dir,
        "--num-epochs", 8, "--train-batch-size", 256,
        "--test-batch-size", 512, "--lr", 1e-3, "--decay", 0.0,
        "--early", 4, "--early-criterion", "n20", "--mp-enabled",
        "--gradient-max-norm", 5.0, "--factor-num", 32,
        "--num-ng", 1, "--max-sample-items", 500, "--valid-size", 0.2,
        "--experiment-name", "GMF-for-HPO",
    ])
    gmf_rid = last_run_id(out)
    report["stages"].append({"stage": "gmf", "run_id": gmf_rid})

    # 4. substituted space + train params -> hp-tuning
    space = substitute_space(emb_paths, gmf_rid)
    space_path = os.path.join(work, "hpo_ncf_mlp_pmgt_params.TG.yaml")
    import yaml

    with open(space_path, "w", encoding="utf-8") as f:
        yaml.safe_dump(space, f, sort_keys=False)

    with open(os.path.join(REPO, "config/hpo/train_ncf_mlp_pmgt_params.json"),
              encoding="utf-8") as f:
        train_params = json.load(f)
    train_params.update(
        dataset_name="TG", data_dir=data_dir, log_dir=log_dir,
        num_epochs=args.trial_epochs, early=4, valid_size=0.2,
        experiment_name="MLP-PMGT-HPO-TG",
        item_init_emb_path=emb_paths[32],
        max_sample_items=500,
    )
    params_path = os.path.join(work, "train_ncf_mlp_pmgt_params.TG.json")
    with open(params_path, "w", encoding="utf-8") as f:
        json.dump(train_params, f, indent=2)

    storage = os.path.join(work, "hpo_storage.db")
    trials_path = os.path.join(work, "mlp_pmgt_tg_trials.json")

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
    for _ in range(4):  # bounded extension until the record proves both arms
        run_cli([
            "hp-tuning", "--hp-config-path", space_path,
            "--train-config-path", params_path,
            "--n-trials", target, "--study-name", "mlp_pmgt_tg",
            "--storage-path", storage, "--train-name", "ncf",
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
    best = max(done, key=lambda t: t["value"])
    report["best"] = copy.deepcopy(best)

    # 5. best-trial restore: find the registry run tagged with the trial
    from pmgt_tpu.train.registry import RunRegistry

    reg = RunRegistry(log_dir)
    best_run = None
    for run in reg.list_runs("MLP-PMGT-HPO-TG"):
        with open(os.path.join(run.run_dir, "tags.json"), encoding="utf-8") as f:
            tags = json.load(f)
        if tags.get("trial") == str(best["number"]):
            best_run = run
            break
    if best_run is None:
        raise RuntimeError(f"no registry run tagged trial={best['number']}")

    p = best["params"]
    fn, nl = int(p["factor_num"]), int(p["num_layers"])
    eval_cmd = [
        "train-ncf", "--mode", "eval", "--run-id", best_run.run_id,
        "--model-name", "MLP", "--dataset-name", "TG",
        "--data-dir", data_dir, "--log-dir", log_dir,
        "--factor-num", fn, "--num-layers", nl,
        "--item-init-emb-path", emb_paths[ARM_DIM[(fn, nl)]],
        "--normalize-item-init-emb", "--mp-enabled",
        "--num-ng", 1, "--max-sample-items", 500, "--valid-size", 0.2,
        "--seed", int(p["seed"]),
        "--dropout", p["dropout"], "--emb-dropout", p["emb_dropout"],
        "--train-batch-size", int(p["train_batch_size"]),
        "--test-batch-size", 512,
    ]
    out = run_cli(eval_cmd)
    m = re.search(r"test results: (\{.*\})", out)
    try:
        report["best_restore_eval"] = eval(m.group(1)) if m else None  # noqa: S307
    except Exception:
        report["best_restore_eval"] = m.group(1)
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
