"""End-to-end training-engine test on synthetic features (CPU):
loss decreases, metrics improve, checkpoint round-trips."""

import numpy as np

import jax.numpy as jnp

from ctc_tpu.data import synthetic_feature_batches
from ctc_tpu.models import LSTMHead
from ctc_tpu.train import Trainer


def _loaders():
    train = synthetic_feature_batches(
        num_batches=6, batch_size=8, temporal=10, feat_dim=64,
        num_classes=12, seed=0,
    )
    val = synthetic_feature_batches(
        num_batches=2, batch_size=8, temporal=10, feat_dim=64,
        num_classes=12, seed=1,
    )
    return train, val


def test_trainer_learns_and_checkpoints(tmp_path):
    train, val = _loaders()
    trainer = Trainer(
        LSTMHead(hidden=12),
        loss_kind="noblank",
        lr=5e-3,
        steps_per_epoch=len(train),
        cache_dir=str(tmp_path),
        print_freq=100,
        implementation="xla",
    )
    state, history = trainer.fit(train, val, epochs=8)
    first, last = history[0], history[-1]
    assert last["train"]["loss"] < first["train"]["loss"] * 0.9, history
    assert last["train"]["top1"] > first["train"]["top1"], history

    # checkpoint round-trip into a fresh state
    from ctc_tpu.train import checkpoints as ckpt

    fresh = trainer.init_state(train[0])
    restored, epoch, score = ckpt.load(str(tmp_path), fresh)
    assert epoch == 7
    lhs = jnp.ravel(
        jnp.asarray(
            restored.params["feature_head"]["proj"]["kernel"]
        )
    )
    rhs = jnp.ravel(jnp.asarray(state.params["feature_head"]["proj"]["kernel"]))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs))
    # logs written
    assert (tmp_path / "train_log.csv").exists()
    assert (tmp_path / "score.csv").exists()


def test_trainer_binary_loss_smoke():
    train = synthetic_feature_batches(
        num_batches=2, batch_size=8, temporal=10, feat_dim=32,
        num_classes=9, binary=True, seed=2,
    )
    trainer = Trainer(
        LSTMHead(hidden=9), loss_kind="binary", lr=1e-3,
        steps_per_epoch=len(train), implementation="xla",
    )
    state = trainer.init_state(train[0])
    state, metrics = trainer.train_epoch(state, train, epoch=0)
    assert np.isfinite(metrics["loss"])


def test_gradient_accumulation_torch_semantics():
    """--accum-grad k: no optimizer step until the k-th batch, then one Adam
    step on the SUM of the k gradients (reference train.py:444-453 torch
    .grad accumulation semantics)."""
    import flax
    import jax

    from ctc_tpu import losses
    from ctc_tpu.train.trainer import torch_style_adam

    train = synthetic_feature_batches(
        num_batches=2, batch_size=4, temporal=6, feat_dim=16,
        num_classes=7, seed=3,
    )
    model = LSTMHead(hidden=7, dropout_rate=0.0)
    trainer = Trainer(
        model, loss_kind="noblank", lr=1e-2, steps_per_epoch=len(train),
        implementation="xla", accum_grad=2,
    )
    state0 = trainer.init_state(train[0])
    rng = trainer.rng

    state1, _ = trainer.train_step(state0, train[0], rng)
    # mini-step 1 of 2: gradients accumulated, parameters untouched
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state1.params, state0.params,
    )
    state2, _ = trainer.train_step(state1, train[1], rng)
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state2.params, state0.params,
    ))
    assert max(moved) > 0.0

    # manual: one torch-style Adam step on g1 + g2 (batch_stats evolve batchwise)
    def loss_for(params, batch_stats, batch, step):
        feats = jnp.transpose(batch["feats"], (1, 0, 2))
        logits, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(rng, step)},
        )
        loss = losses.no_blank_ctc_loss(
            logits, batch["paths"], batch["input_lengths"],
            batch["target_lengths"], implementation="xla",
        )
        return loss, mut["batch_stats"]

    grad_fn = jax.grad(loss_for, has_aux=True)
    g1, bs1 = grad_fn(state0.params, state0.batch_stats, train[0], 0)
    g2, _ = grad_fn(state0.params, bs1, train[1], 1)
    gsum = jax.tree.map(lambda a, b: a + b, g1, g2)

    import optax

    tx = torch_style_adam(trainer.schedule, 0.0)
    updates, _ = tx.update(gsum, tx.init(state0.params), state0.params)
    expected = optax.apply_updates(state0.params, updates)
    # feature_head/proj/bias sits directly before BatchNorm, so its true
    # gradient is mathematically zero; Adam turns that float noise into a
    # ±lr step whose sign depends on XLA fusion — exclude the degenerate leaf
    def drop_proj_bias(tree):
        t = jax.tree.map(lambda x: x, tree)  # shallow copy
        t["feature_head"]["proj"].pop("bias")
        return t

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        drop_proj_bias(flax.core.unfreeze(state2.params)),
        drop_proj_bias(flax.core.unfreeze(expected)),
    )


def test_train_val_size_subsampling():
    """--train-size/--val-size epoch subsampling (reference train.py:363,508:
    islice to int(len*size); size > 1 caps at the full loader)."""

    class Counting(list):
        def __init__(self, batches):
            super().__init__(batches)
            self.consumed = 0

        def __iter__(self):
            def gen():
                for b in super(Counting, self).__iter__():
                    self.consumed += 1
                    yield b
            return gen()

    batches = synthetic_feature_batches(
        num_batches=4, batch_size=4, temporal=6, feat_dim=16,
        num_classes=7, seed=0,
    )
    train = Counting(batches)
    val = Counting(batches)
    trainer = Trainer(
        LSTMHead(hidden=7), loss_kind="noblank", implementation="xla",
        train_size=0.5, val_size=2.0,
    )
    state = trainer.init_state(batches[0])
    state, _ = trainer.train_epoch(state, train, epoch=0)
    trainer.validate(state, val, epoch=0)
    assert train.consumed == 2  # int(4 * 0.5)
    assert val.consumed == 4    # islice caps at the full loader


def test_validate_transition_metrics_and_video_eval(tmp_path):
    """transition_metrics=True reports the DTW family batch-averaged (cross
    checked against the per-sample metric functions), and fit(video_eval=...)
    records mAP and selects the best checkpoint by it."""
    import jax

    from ctc_tpu.train.metrics import transition_accuracy, transition_recall

    train, val = _loaders()
    trainer = Trainer(
        LSTMHead(hidden=12),
        loss_kind="noblank",
        lr=5e-3,
        steps_per_epoch=len(train),
        cache_dir=str(tmp_path),
        implementation="xla",
        transition_metrics=True,
    )
    state = trainer.init_state(train[0])
    metrics = trainer.validate(state, val, epoch=0)
    for k in ("trans_top1", "trans_top5", "recall_top1", "recall_top5"):
        assert k in metrics, metrics

    # cross-check the batch average against the per-sample functions
    batch = val[0]
    logits = trainer.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.transpose(jnp.asarray(batch["feats"]), (1, 0, 2)),
        train=False,
    )
    paths_mh = jax.nn.one_hot(
        jnp.mod(jnp.asarray(batch["paths"]), logits.shape[2]), logits.shape[2]
    )
    want_t1 = np.mean([
        float(transition_accuracy(
            logits[:, b], paths_mh[b], batch["target_lengths"][b]
        )[0][0])
        for b in range(logits.shape[1])
    ])
    got = trainer.eval_step(state, batch)
    np.testing.assert_allclose(float(got["trans_top1"]), want_t1, rtol=1e-5)

    calls = []

    def fake_video_eval(state):
        calls.append(1)
        return {"mAP": 0.5 + 0.01 * len(calls)}

    _, history = trainer.fit(train, val, epochs=2, video_eval=fake_video_eval)
    assert len(calls) == 2
    assert history[-1]["val"]["mAP"] == 0.52
    import csv as _csv

    with open(tmp_path / "score.csv") as f:
        rows = list(_csv.reader(f))
    assert len(rows[-1]) == 6  # epoch, tr_loss, val_loss, top1, top5, mAP


def test_steps_per_dispatch_matches_single_steps():
    """Trainer(steps_per_dispatch=4): the K-step scanned program reproduces
    K individual train_step calls exactly (rng folds by state.step inside
    the body), including the sub-K epoch remainder and meters."""
    import jax
    import numpy as np

    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.models import LSTMHead

    batches = synthetic_feature_batches(
        num_batches=6, batch_size=4, temporal=6, feat_dim=16,
        num_classes=9, seed=2,
    )
    model = LSTMHead(hidden=9, dropout_rate=0.3)  # dropout ON: rng parity
    common = dict(loss_kind="noblank", lr=1e-2, seed=0,
                  implementation="xla")
    tr_multi = Trainer(model, steps_per_dispatch=4, **common)
    tr_single = Trainer(model, **common)
    s_m = tr_multi.init_state(batches[0])
    s_s = tr_single.init_state(batches[0])
    # 6 batches = one full K=4 group + a remainder of 2 single steps
    s_m, metrics_m = tr_multi.train_epoch(s_m, batches, epoch=0)
    s_s, metrics_s = tr_single.train_epoch(s_s, batches, epoch=0)
    np.testing.assert_allclose(
        metrics_m["loss"], metrics_s["loss"], rtol=1e-5, atol=1e-6
    )
    # the eval twin: scanned K-batch validate == per-batch validate
    val_m = tr_multi.validate(s_m, batches, epoch=0)
    val_s = tr_single.validate(s_s, batches, epoch=0)
    np.testing.assert_allclose(
        val_m["loss"], val_s["loss"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        metrics_m["top1"], metrics_s["top1"], rtol=1e-5, atol=1e-6
    )
    assert int(s_m.step) == int(s_s.step) == 6
    for a, b in zip(jax.tree_util.tree_leaves(s_s.params),
                    jax.tree_util.tree_leaves(s_m.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_steps_per_dispatch_composes_with_mesh():
    """steps_per_dispatch=2 on a data mesh (and on a composed data×model
    mesh): the K-step GSPMD program reproduces the plain single-device
    epoch exactly."""
    import jax
    import numpy as np

    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.parallel.mesh import make_mesh

    for kwargs, mesh, binary in (
        ({}, make_mesh(data=8), False),
        ({"model_parallel": 4}, make_mesh(data=2, model=4), True),
    ):
        loss_kind = "binary" if binary else "noblank"
        batches = synthetic_feature_batches(
            num_batches=5, batch_size=8, temporal=6, feat_dim=16,
            num_classes=12, seed=6, binary=binary,
        )
        model = LSTMHead(hidden=12, dropout_rate=0.0)
        common = dict(loss_kind=loss_kind, lr=1e-2, seed=0,
                      implementation="xla")
        tr_mesh = Trainer(model, mesh=mesh, steps_per_dispatch=2,
                          **common, **kwargs)
        tr_plain = Trainer(model, **common)
        s_m = tr_mesh.init_state(batches[0])
        s_p = tr_plain.init_state(batches[0])
        # 5 batches = two K=2 groups + 1 remainder single (sharded) step
        s_m, metrics_m = tr_mesh.train_epoch(s_m, batches, epoch=0)
        s_p, metrics_p = tr_plain.train_epoch(s_p, batches, epoch=0)
        np.testing.assert_allclose(
            metrics_m["loss"], metrics_p["loss"], rtol=1e-5, atol=1e-6
        )
        assert int(jax.device_get(s_m.step)) == 5
        # validate through the mesh + K path too — on the SAME state
        # (independently trained states drift on zero-grad leaves under
        # Adam, moving eval loss ~1e-3)
        val_m = tr_mesh.validate(s_m, batches, epoch=0)
        val_p = tr_plain.validate(s_m, batches, epoch=0)
        np.testing.assert_allclose(
            val_m["loss"], val_p["loss"], rtol=1e-5, atol=1e-6
        )


def test_ce_weight_mixes_final_step_cross_entropy():
    """--alpha / ce_weight: the train-step loss equals
    ctc + alpha * CE(logits[-1], future_target) computed by hand
    (the reference's CE-vs-CTC mixing scale, opts.py:74), in the plain
    step and through the composed data-mesh step."""
    import jax
    import numpy as np

    from ctc_tpu import losses as L
    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.parallel.mesh import make_mesh
    from ctc_tpu.train import trainer as tr

    batches = synthetic_feature_batches(
        num_batches=1, batch_size=8, temporal=6, feat_dim=16,
        num_classes=9, seed=11,
    )
    b = {k: jnp.asarray(v) for k, v in batches[0].items()}
    model = LSTMHead(hidden=9, dropout_rate=0.0)
    feats = jnp.transpose(b["feats"], (1, 0, 2))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, train=True,
    )
    state = tr.TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tr.torch_style_adam(1e-3),
    )
    alpha = 0.5
    step = tr.make_train_step(model, "noblank", implementation="xla",
                              ce_weight=alpha)
    _, metrics = step(state, b, jax.random.PRNGKey(0))

    logits, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        feats, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(0), 0)},
    )
    want = L.no_blank_ctc_loss(
        logits, b["paths"], b["input_lengths"], b["target_lengths"],
        implementation="xla",
    ) + alpha * L.cross_entropy(logits[-1], b["future_target"])
    np.testing.assert_allclose(
        float(metrics["loss"]), float(want), rtol=1e-5, atol=1e-6
    )

    # the CLI spelling: --alpha != 1.0 becomes ce_weight, and the mesh
    # trainer reproduces the plain trainer's mixed loss (same seed)
    common = dict(loss_kind="noblank", implementation="xla",
                  ce_weight=alpha, seed=0)
    tr_mesh = Trainer(model, mesh=make_mesh(data=8), **common)
    tr_plain = Trainer(model, **common)
    s_mesh = tr_mesh.init_state(batches[0])
    s_plain = tr_plain.init_state(batches[0])
    _, m_mesh = tr_mesh.train_step(
        s_mesh, tr_mesh._place(batches[0]), jax.random.PRNGKey(0)
    )
    _, m_plain = tr_plain.train_step(s_plain, b, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m_mesh["loss"]), float(m_plain["loss"]), rtol=1e-4, atol=1e-5
    )


def test_steps_per_dispatch_with_seq_parallel():
    """K>1 with the single-axis seq-sharded loss: the scanned shard_map
    pipeline reproduces per-batch training."""
    import numpy as np

    from ctc_tpu.data import synthetic_feature_batches

    batches = synthetic_feature_batches(
        num_batches=4, batch_size=8, temporal=8, feat_dim=16,
        num_classes=9, seed=8,
    )
    model = LSTMHead(hidden=9, dropout_rate=0.0)
    common = dict(loss_kind="noblank", lr=1e-2, seed=0,
                  implementation="xla", seq_parallel=4)
    tr_k = Trainer(model, steps_per_dispatch=2, **common)
    tr_1 = Trainer(model, **common)
    s_k = tr_k.init_state(batches[0])
    s_1 = tr_1.init_state(batches[0])
    s_k, m_k = tr_k.train_epoch(s_k, batches, epoch=0)
    s_1, m_1 = tr_1.train_epoch(s_1, batches, epoch=0)
    np.testing.assert_allclose(m_k["loss"], m_1["loss"], rtol=1e-5,
                               atol=1e-6)
