"""End-to-end integration: PMGT pretrain → loss decreases → embedding
export → NCF/DCN fine-tune consuming the exported embeddings (the
reference's full workflow, scripts/run_pmgt.sh → run_ncf.sh)."""
import os

import jax
import numpy as np
import pytest

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.artifacts import save_native
from pmgt_tpu.data.synthetic import make_synthetic_dataset
from pmgt_tpu.train.registry import RunRegistry

EXTRA_PMGT = dict(
    hidden_size=16,
    intermediate_size=16,
    num_hidden_layers=1,
    hop_sampling_sizes=(3, 2),
    max_ctx_neigh=3,
)


@pytest.fixture(scope="module")
def art():
    return make_synthetic_dataset(
        num_nodes=60, num_users=60, feat_dims=(16, 12), avg_degree=8, seed=5
    )


@pytest.fixture(scope="module")
def pretrained(tmp_path_factory, art):
    """Pretrain PMGT briefly; return (log_dir, run_id, emb_path)."""
    from pmgt_tpu.tasks import pmgt_task

    tmp = tmp_path_factory.mktemp("e2e")
    args = TrainArgs(
        model_name="PMGT",
        dataset_name="SYN",
        seed=0,
        num_epochs=5,
        train_batch_size=16,
        test_batch_size=32,
        lr=5e-3,
        early=5,
        early_criterion="auc",
        valid_size=0.2,
        log_dir=str(tmp / "logs"),
        extra=dict(EXTRA_PMGT),
    )
    ctx = {"artifacts": art}
    pmgt_task.check_args(args)
    pmgt_task.init_run(args)
    pmgt_task.init_dataloader(args, ctx)
    pmgt_task.init_model(args, ctx)
    registry = RunRegistry(args.log_dir)
    run = registry.create_run("PMGT", args.to_dict())

    # capture first/last epoch losses through the registry
    results = pmgt_task.train(args, ctx, registry, run)
    metrics = run.metrics()
    train_losses = [m["value"] for m in metrics if m["name"] == "loss/train"]
    assert len(train_losses) >= 2
    assert min(train_losses[1:]) < train_losses[0], (
        f"pretraining loss must decrease: {train_losses}"
    )
    assert results["val/auc"] > 0.6, "pretraining must learn structure"

    emb_path = str(tmp / "node_emb.npy")
    args.inference_result_path = emb_path
    emb = pmgt_task.inference(args, ctx, registry, run)
    assert emb.shape == (60, 16)
    assert os.path.exists(emb_path)
    return args.log_dir, run.run_id, emb_path


def test_pmgt_pretrain_and_export(pretrained):
    pass  # assertions live in the fixture


def test_pmgt_inference_restore_ignores_optimizer_flags(pretrained, art):
    """`--mode inference --run-id X` must restore from a fresh process
    even when the invocation's optimizer flags differ from the training
    run's (eval/inference only need params; a full-state restore
    template would demand every opt-state-shaping flag match — e.g.
    gradient_max_norm adds a clip link to the optax chain)."""
    from pmgt_tpu.tasks import pmgt_task

    log_dir, run_id, _ = pretrained

    def export(gradient_max_norm):
        args = TrainArgs(
            model_name="PMGT",
            dataset_name="SYN",
            seed=0,
            mode="inference",
            run_id=run_id,
            gradient_max_norm=gradient_max_norm,
            log_dir=log_dir,
            early_criterion="auc",
            extra=dict(EXTRA_PMGT),
        )
        ctx = {"artifacts": art}
        pmgt_task.check_args(args)
        pmgt_task.init_dataloader(args, ctx)
        pmgt_task.init_model(args, ctx)
        registry = RunRegistry(log_dir)
        return pmgt_task.inference(args, ctx, registry, registry.get_run(run_id))

    # training ran WITHOUT clipping; both invocations must restore the
    # same best-checkpoint params regardless of their optimizer flags
    emb_clip = export(gradient_max_norm=5.0)
    emb_plain = export(gradient_max_norm=None)
    assert emb_clip.shape == (60, 16)
    np.testing.assert_array_equal(emb_clip, emb_plain)


def test_ncf_consumes_pmgt_embeddings(pretrained, art):
    from pmgt_tpu.tasks import ncf_task

    log_dir, _, emb_path = pretrained
    args = TrainArgs(
        model_name="NeuMF-end",
        dataset_name="SYN",
        seed=0,
        num_epochs=2,
        train_batch_size=64,
        test_batch_size=128,
        lr=2e-3,
        early=3,
        early_criterion="n20",
        valid_size=0.2,
        log_dir=log_dir,
        extra=dict(
            factor_num=8,
            num_layers=2,  # mlp item dim = 8 * 2^(2-1) = 16 = PMGT hidden
            num_ng=2,
            max_sample_items=40,
            item_init_emb_path=emb_path,
            normalize_item_init_emb=True,
        ),
    )
    ctx = {"artifacts": art}
    ncf_task.check_args(args)
    ncf_task.init_run(args)
    ncf_task.init_dataloader(args, ctx)
    ncf_task.init_model(args, ctx)

    # injected embeddings actually landed in the table
    emb = np.load(emb_path)
    table = np.asarray(
        ctx["task"].state.params["embed_item_MLP"]["embedding"]
    )
    norm = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(table, norm, rtol=1e-5, atol=1e-6)

    registry = RunRegistry(args.log_dir)
    run = registry.create_run("NCF", args.to_dict())
    results = ncf_task.train(args, ctx, registry, run)
    assert "val/n20" in results
    test_results = ncf_task.test(args, ctx, registry, run)
    assert set(test_results) >= {"test/n10", "test/n20", "test/r10", "test/r20"}


def test_dcn_consumes_pmgt_embeddings(pretrained, art):
    from pmgt_tpu.tasks import dcn_task

    log_dir, _, emb_path = pretrained
    args = TrainArgs(
        model_name="DCN",
        dataset_name="SYN",
        seed=0,
        num_epochs=2,
        train_batch_size=64,
        test_batch_size=128,
        lr=2e-3,
        early=3,
        early_criterion="auc",
        valid_size=0.2,
        log_dir=log_dir,
        extra=dict(
            factor_num=4,
            deep_net_num_layers=2,  # item emb dim = 4 * 2^2 = 16
            cross_net_num_layers=2,
            num_ng=2,
            max_sample_items=3,
            item_init_emb_path=emb_path,
            normalize_item_init_emb=True,
            freeze_item_init_emb=True,
        ),
    )
    ctx = {"artifacts": art}
    dcn_task.check_args(args)
    dcn_task.init_run(args)
    dcn_task.init_dataloader(args, ctx)
    dcn_task.init_model(args, ctx)

    frozen_before = np.asarray(
        ctx["task"].state.params["item_embeddings"]["embedding"]
    ).copy()

    registry = RunRegistry(args.log_dir)
    run = registry.create_run("DCN", args.to_dict())
    results = dcn_task.train(args, ctx, registry, run)
    assert "val/auc" in results

    # frozen embeddings must not move
    frozen_after = np.asarray(
        ctx["task"].state.params["item_embeddings"]["embedding"]
    )
    np.testing.assert_allclose(frozen_before, frozen_after, atol=1e-7)


def test_pmgt_resume_from_checkpoint(pretrained, art):
    """--run-id resume restores hyperparameters and weights."""
    from pmgt_tpu.tasks import pmgt_task

    log_dir, run_id, _ = pretrained
    args = TrainArgs(
        model_name="PMGT",
        dataset_name="SYN",
        seed=0,
        num_epochs=6,  # one more than already done
        train_batch_size=16,
        test_batch_size=32,
        lr=3e-3,
        early=5,
        early_criterion="auc",
        valid_size=0.2,
        log_dir=log_dir,
        run_id=run_id,
        extra={},  # hyperparameters come from the stored run
    )
    ctx = {"artifacts": art}
    pmgt_task.check_args(args)
    pmgt_task.init_run(args)
    pmgt_task.init_dataloader(args, ctx)
    # hyperparameters restored from the run registry
    assert args.extra["hidden_size"] == 16
    assert tuple(args.extra["hop_sampling_sizes"]) == (3, 2)
    pmgt_task.init_model(args, ctx)
    registry = RunRegistry(args.log_dir)
    run = registry.get_run(run_id)
    results = pmgt_task.train(args, ctx, registry, run)
    assert "val/auc" in results

