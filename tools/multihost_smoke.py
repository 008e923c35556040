"""Two-process multi-host smoke: run one PMGT training epoch + eval on a
global mesh spanning both processes' (virtual CPU) devices.

Launch one instance per process:

    python tools/multihost_smoke.py --process-id 0 --port 29901 &
    python tools/multihost_smoke.py --process-id 1 --port 29901

Each process builds identical artifacts from the shared seed, contributes
its local batch shards via ``put_along_data_axis``, and must print the
same epoch losses and validation metrics (parameters stay replicated, XLA
all-reduces grads over the cross-process "ICI"). Exercised by
tests/test_multihost.py.
"""
from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--num-processes", type=int, default=2)
    parser.add_argument("--port", type=int, default=29901)
    parser.add_argument("--devices-per-process", type=int, default=4)
    parser.add_argument(
        "--flow", choices=["epoch", "fit"], default="epoch",
        help="epoch: one train_epoch + eval (numeric identity); fit: the "
        "full engine with registry + checkpoints, optionally preempted "
        "and resumed (multi-host ckpt/resume hardening)")
    parser.add_argument("--log-dir", default=None)
    parser.add_argument("--run-id", default=None, help="resume this run")
    parser.add_argument("--num-epochs", type=int, default=4)
    parser.add_argument(
        "--preempt-at-epoch", type=int, default=None,
        help="self-SIGTERM at the start of this epoch on every process "
        "(the engine's guard finishes the epoch, checkpoints, and marks "
        "the run INTERRUPTED)")
    args = parser.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.devices_per_process}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pmgt_tpu.core.mesh import initialize_distributed

    assert initialize_distributed(
        f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes

    import numpy as np

    from pmgt_tpu.core.config import TrainArgs
    from pmgt_tpu.data.synthetic import make_synthetic_dataset
    from pmgt_tpu.graph.container import NUM_SPECIAL_NODES
    from pmgt_tpu.tasks.pmgt_task import PMGTTask

    # Identical on every process: everything derives from the shared seed.
    art = make_synthetic_dataset(
        num_nodes=120, num_users=40, feat_dims=(24, 16), seed=0
    )
    targs = TrainArgs(
        model_name="pmgt",
        dataset_name="synth",
        seed=0,
        train_batch_size=32,
        test_batch_size=32,
        num_epochs=1,
        extra={
            "hidden_size": 16,
            "intermediate_size": 16,
            "num_hidden_layers": 2,
            "num_attention_heads": 1,
            "hop_sampling_sizes": (4, 3, 2),
            "prng_impl": "threefry2x32",
        },
    )
    nodes = np.arange(
        NUM_SPECIAL_NODES, art.num_nodes + NUM_SPECIAL_NODES, dtype=np.int32
    )
    if args.run_id:
        targs.run_id = args.run_id
    targs.num_epochs = args.num_epochs
    task = PMGTTask(targs, art, nodes[:96], nodes[96:])
    assert task.mesh.size == args.num_processes * args.devices_per_process

    if args.flow == "epoch":
        state, losses = task.train_epoch(task.state, 0)
        losses = np.asarray(jax.device_get(losses))
        metrics = task.evaluate(state, "valid")
        print(
            f"MULTIHOST_OK p{args.process_id}/{jax.process_count()} "
            f"mesh={task.mesh.size} loss0={losses[0]:.6f} "
            f"lossN={losses[-1]:.6f} val_auc={metrics['val/auc']:.6f}",
            flush=True,
        )
        return

    # --- flow == "fit": engine + registry + Orbax over the global mesh ---
    import signal

    from pmgt_tpu.train import engine
    from pmgt_tpu.train.registry import RunRegistry

    registry = RunRegistry(args.log_dir)
    if args.run_id:
        run = registry.get_run(args.run_id)
    else:
        run = registry.create_run("mh", targs.to_dict())

    if args.preempt_at_epoch is not None:
        orig = task.on_epoch_start

        def preempting(epoch):
            if epoch == args.preempt_at_epoch:
                # every process requests its own graceful stop — the
                # engine guard finishes this epoch, checkpoints, and
                # marks INTERRUPTED (primary only writes the status)
                os.kill(os.getpid(), signal.SIGTERM)
            orig(epoch)

        task.on_epoch_start = preempting

    results = engine.fit(
        task,
        num_epochs=args.num_epochs,
        early=99,
        early_criterion="auc",
        registry=registry,
        run=run,
        resume=args.run_id is not None,
        log_every=0,
    )
    # mirror the CLI dispatcher's end-of-run status transition
    # (pmgt_tpu/cli/main.py train_model): a preempted run keeps INTERRUPTED
    if run.status != "INTERRUPTED":
        registry.set_status(run, "FINISHED")

    from pmgt_tpu.train.checkpoints import restore_checkpoint

    payload = restore_checkpoint(os.path.join(run.ckpt_dir, "last"))
    print(
        f"MULTIHOST_FIT_OK p{args.process_id}/{jax.process_count()} "
        f"run={run.run_id} status={run.status} "
        f"last_epoch={int(payload['meta']['epoch'])} "
        f"best={results['best']:.6f} val_auc={results['val/auc']:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
