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
    task = PMGTTask(targs, art, nodes[:96], nodes[96:])
    assert task.mesh.size == args.num_processes * args.devices_per_process

    state, losses = task.train_epoch(task.state, 0)
    losses = np.asarray(jax.device_get(losses))
    metrics = task.evaluate(state, "valid")
    print(
        f"MULTIHOST_OK p{args.process_id}/{jax.process_count()} "
        f"mesh={task.mesh.size} loss0={losses[0]:.6f} "
        f"lossN={losses[-1]:.6f} val_auc={metrics['val/auc']:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
