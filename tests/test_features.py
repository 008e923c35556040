"""Feature tests: relative-position attention, gradient checkpointing,
head pruning, SWA, PMGT_NCF workload."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmgt_tpu.core.config import PMGTConfig, TrainArgs
from pmgt_tpu.data.synthetic import make_synthetic_dataset
from pmgt_tpu.models.pmgt import PMGTForPreTraining
from pmgt_tpu.models.pruning import prune_attention_heads
from pmgt_tpu.sampling.pairs import PretrainBatch


def _batch(rng, b=4, p=3, s=4, n=10):
    return PretrainBatch(
        target_ids=jnp.asarray(rng.integers(2, n, (b, s)), jnp.int32),
        target_mask=jnp.ones((b, s), jnp.float32),
        pair_ids=jnp.asarray(rng.integers(2, n, (b, p, s)), jnp.int32),
        pair_mask=jnp.ones((b, p, s), jnp.float32),
        labels=jnp.asarray(rng.integers(0, 2, (b, p)).astype(np.float32)),
        pair_valid=jnp.ones((b, p), jnp.float32),
    )


def _cfg(**kw):
    base = dict(
        hidden_size=16,
        intermediate_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        feat_hidden_sizes=(12, 8),
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    base.update(kw)
    return PMGTConfig(**base)


def _run_model(cfg, rng, batch=None):
    model = PMGTForPreTraining(config=cfg, node_size=8)
    batch = batch if batch is not None else _batch(rng)
    tables = [
        jnp.asarray(rng.normal(size=(10, f)).astype(np.float32))
        for f in cfg.feat_hidden_sizes
    ]
    params = model.init(
        {"params": jax.random.key(0)},
        tables,
        batch,
        deterministic=True,
        compute_nfr=False,
    )["params"]
    out = model.apply(
        {"params": params}, tables, batch, deterministic=True, compute_nfr=False
    )
    return model, params, tables, batch, out


@pytest.mark.parametrize("pet", ["relative_key", "relative_key_query"])
def test_relative_position_attention(pet):
    rng = np.random.default_rng(0)
    cfg = _cfg(position_embedding_type=pet)
    model, params, tables, batch, out = _run_model(cfg, rng)
    assert np.isfinite(float(out.loss))
    # the distance embedding parameter exists in every layer
    attn = params["bert"]["layer_0"]["self_attention"]
    assert "distance_embedding" in attn
    assert attn["distance_embedding"].shape == (
        2 * cfg.max_position_embeddings - 1,
        cfg.head_dim,
    )
    # perturbing the distance embedding (non-uniformly — row-constant
    # shifts are softmax-invariant) must change the output
    model = PMGTForPreTraining(config=cfg, node_size=8)
    p = jax.tree.map(lambda x: x, params)
    for layer in ("layer_0", "layer_1"):
        att = dict(p["bert"][layer]["self_attention"])
        noise = jax.random.normal(
            jax.random.key(7), att["distance_embedding"].shape
        )
        att["distance_embedding"] = att["distance_embedding"] + noise
        layer_d = dict(p["bert"][layer])
        layer_d["self_attention"] = att
        bert = dict(p["bert"])
        bert[layer] = layer_d
        p = dict(p)
        p["bert"] = bert
    out2 = model.apply(
        {"params": p}, tables, batch, deterministic=True, compute_nfr=False
    )
    assert float(out2.loss) != pytest.approx(float(out.loss), abs=1e-6)


def test_gradient_checkpointing_same_grads():
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    tables = [
        jnp.asarray(rng.normal(size=(10, f)).astype(np.float32)) for f in (12, 8)
    ]

    grads = {}
    for ckpt in (False, True):
        cfg = _cfg(gradient_checkpointing=ckpt)
        model = PMGTForPreTraining(config=cfg, node_size=8)
        params = model.init(
            {"params": jax.random.key(0)},
            tables,
            batch,
            deterministic=True,
            compute_nfr=False,
        )["params"]

        def loss_fn(p):
            return model.apply(
                {"params": p}, tables, batch, deterministic=True, compute_nfr=False
            ).loss

        grads[ckpt] = jax.grad(loss_fn)(params)

    for a, b in zip(jax.tree.leaves(grads[False]), jax.tree.leaves(grads[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_head_pruning_preserves_kept_heads():
    """Pruned model must compute exactly what the full model computes when
    the pruned heads' contribution is removed — verified by checking the
    pruned forward runs and parameter shapes shrink consistently."""
    rng = np.random.default_rng(2)
    cfg = _cfg(num_attention_heads=2)
    model, params, tables, batch, out_full = _run_model(cfg, rng)

    pruned_params, pruned_cfg = prune_attention_heads(
        {"bert": dict(params["bert"]),
         **{k: v for k, v in params.items() if k != "bert"}},
        cfg,
        {0: [1], 1: [1]},
    )
    assert pruned_cfg.num_attention_heads == 1
    assert pruned_cfg.head_dim == cfg.head_dim
    attn = pruned_params["bert"]["layer_0"]["self_attention"]
    assert attn["query"]["kernel"].shape == (16, 8)
    assert attn["query"]["bias"].shape == (8,)
    out_k = pruned_params["bert"]["layer_0"]["attention_output"]["kernel"]
    assert out_k.shape == (8, 16)

    pruned_model = PMGTForPreTraining(config=pruned_cfg, node_size=8)
    out_pruned = pruned_model.apply(
        {"params": pruned_params},
        tables,
        batch,
        deterministic=True,
        compute_nfr=False,
    )
    assert np.isfinite(float(out_pruned.loss))


def test_head_pruning_validates_uniformity():
    cfg = _cfg(num_attention_heads=2)
    with pytest.raises(ValueError):
        prune_attention_heads({"bert": {}}, cfg, {0: [0]})  # missing layer 1
    with pytest.raises(ValueError):
        prune_attention_heads({"bert": {}}, cfg, {0: [0, 1], 1: [0, 1]})


def test_swa_averaging():
    from pmgt_tpu.train.engine import SWAAverager

    swa = SWAAverager()
    swa.update({"w": jnp.asarray([1.0, 2.0])})
    swa.update({"w": jnp.asarray([3.0, 4.0])})
    swa.update({"w": jnp.asarray([5.0, 6.0])})
    np.testing.assert_allclose(np.asarray(swa.avg["w"]), [3.0, 4.0])
    assert swa.n == 3


def test_swa_in_engine(tmp_path):
    """fit with swa_start produces swa metrics and checkpoint."""
    import os

    from pmgt_tpu.train import engine
    from pmgt_tpu.train.registry import RunRegistry
    from tests.test_engine import FakeTask

    class StateTask(FakeTask):
        def __init__(self, seq):
            super().__init__(seq)
            from collections import namedtuple

            St = namedtuple("St", ["params", "opt"])
            self.state = St({"w": jnp.asarray([0.0])}, None)
            self._St = St

        def train_step(self, state, batch):
            new = state._replace(
                params={"w": state.params["w"] + 1.0}
            )
            return new, {"loss": jnp.asarray(0.1)}

    reg = RunRegistry(str(tmp_path))
    run = reg.create_run("e", {})
    task = StateTask([0.5, 0.6, 0.7])
    res = engine.fit(
        task,
        num_epochs=3,
        early=5,
        early_criterion="auc",
        registry=reg,
        run=run,
        log_every=0,
        swa_start=1,
    )
    assert "swa/val/auc" in res
    assert os.path.isdir(os.path.join(run.ckpt_dir, "swa"))
    # params after epochs 1,2 are [2.], [3.] → average [2.5]
    from pmgt_tpu.train.checkpoints import restore_checkpoint

    payload = restore_checkpoint(os.path.join(run.ckpt_dir, "swa"))
    np.testing.assert_allclose(np.asarray(payload["params"]["w"]), [2.5])


def test_pmgt_ncf_task_end_to_end(tmp_path):
    from pmgt_tpu.tasks import pmgt_ncf_task
    from pmgt_tpu.train.registry import RunRegistry

    art = make_synthetic_dataset(
        num_nodes=40, num_users=30, feat_dims=(12, 8), avg_degree=6, seed=9
    )
    args = TrainArgs(
        model_name="NeuMF-end",
        dataset_name="SYN",
        seed=0,
        num_epochs=2,
        train_batch_size=32,
        test_batch_size=256,
        lr=2e-3,
        early=3,
        early_criterion="n20",
        valid_size=0.2,
        log_dir=str(tmp_path / "logs"),
        extra=dict(
            factor_num=8,
            num_layers=2,
            num_ng=1,
            max_sample_items=20,
            hidden_size=8,
            intermediate_size=8,
            num_hidden_layers=1,
            hop_sampling_sizes=(3, 2),
            max_ctx_neigh=3,
        ),
    )
    ctx = {"artifacts": art}
    pmgt_ncf_task.check_args(args)
    pmgt_ncf_task.init_run(args)
    pmgt_ncf_task.init_dataloader(args, ctx)
    pmgt_ncf_task.init_model(args, ctx)
    reg = RunRegistry(args.log_dir)
    run = reg.create_run("PMGT_NCF", args.to_dict())
    res = pmgt_ncf_task.train(args, ctx, reg, run)
    assert "val/n20" in res
    tst = pmgt_ncf_task.test(args, ctx, reg, run)
    assert "test/n20" in tst and "test/r10" in tst

    # serving export through the encoder item tower (items scored over
    # their cached context sequences), chunked catalog
    args.inference_result_path = str(tmp_path / "recs.npz")
    args.extra["topk"] = 7
    args.extra["serve_item_chunk"] = 11
    out = pmgt_ncf_task.inference(args, ctx, reg, run)
    task = ctx["task"]
    ni = task.train_data.num_items
    nu = task.train_data.num_users
    assert out["item_ids"].shape == (nu, 7)
    assert (np.diff(out["scores"], axis=1) <= 1e-6).all()
    assert out["item_ids"].min() >= 0 and out["item_ids"].max() < ni
    # training positives excluded
    td = task.train_data
    for r, u in enumerate(td.unique_users):
        seen = set(td.user_pos[r, : td.user_pos_count[r]].tolist())
        assert not seen & set(out["item_ids"][u].tolist())
    import os

    assert os.path.exists(args.inference_result_path)


def test_pmgt_ncf_eval_independent_of_train_ctx(tmp_path):
    """evaluate() must be a pure function of the params: the engine's
    pipelined scan mode calls on_epoch_start(k+1) BEFORE evaluating
    epoch k, so an eval that read the train ctx cache would score under
    next epoch's contexts (and the final epoch under its own)."""
    from pmgt_tpu.tasks import pmgt_ncf_task
    from pmgt_tpu.tasks.pmgt_ncf_task import PMGTNCFTask
    from pmgt_tpu.data.interactions import InteractionData, train_valid_split

    art = make_synthetic_dataset(
        num_nodes=40, num_users=30, feat_dims=(12, 8), avg_degree=6, seed=9
    )
    args = TrainArgs(
        model_name="NeuMF-end", dataset_name="SYN", seed=0,
        train_batch_size=32, test_batch_size=64, valid_size=0.2,
        early_criterion="n20",
        log_dir=str(tmp_path / "logs"),
        extra=dict(
            factor_num=8, num_layers=2, num_ng=1, max_sample_items=20,
            hidden_size=8, intermediate_size=8, num_hidden_layers=1,
            hop_sampling_sizes=(3, 2), max_ctx_neigh=3,
        ),
    )
    train_pairs, valid_pairs = train_valid_split(
        art.train_pairs, args.valid_size, args.seed
    )
    nu, ni = art.num_users, art.num_items
    task = PMGTNCFTask(
        args,
        art,
        InteractionData.build(train_pairs, nu, ni),
        InteractionData.build(valid_pairs, nu, ni),
        InteractionData.build(art.test_pairs, nu, ni),
    )
    m0 = task.evaluate(task.state, "valid")
    task.on_epoch_start(0)
    m1 = task.evaluate(task.state, "valid")
    task.on_epoch_start(1)
    m2 = task.evaluate(task.state, "valid")
    assert m0 == m1 == m2
