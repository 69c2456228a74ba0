"""Joint (o, v) two-head mode: loss composition, trainer, mesh, and the CLI
relation-eval consumer (reference models/__init__.py:82-86 instantiates both
blank-free losses; train.py:366-399 threads o_target + v_target; the relation
eval at utils/__init__.py:61-113 was dead code — live here)."""

import numpy as np

import jax.numpy as jnp

from ctc_tpu import losses
from ctc_tpu.data.synthetic import (
    pack_joint_batches,
    synthetic_feature_batches,
)
from ctc_tpu.models import LSTMHead
from ctc_tpu.train import Trainer

V, O = 9, 5


def _joint_batches(num_batches=4, batch_size=8, temporal=8, feat_dim=24,
                   seed=0):
    return pack_joint_batches(
        synthetic_feature_batches(
            num_batches=num_batches, batch_size=batch_size, temporal=temporal,
            feat_dim=feat_dim, num_classes=V, seed=seed,
        ),
        O,
    )


def test_joint_loss_is_sum_of_head_losses(rng):
    """joint_ov_ctc_loss == noblank(verb slice) + binary(object slice)."""
    (batch,) = _joint_batches(num_batches=1)
    t, b = batch["feats"].shape[1], batch["feats"].shape[0]
    logits = jnp.asarray(rng.standard_normal((t, b, V + O)), jnp.float32)
    paths = jnp.asarray(batch["paths"])
    in_len = jnp.asarray(batch["input_lengths"])
    tgt = jnp.asarray(batch["target_lengths"])

    joint = losses.joint_ov_ctc_loss(
        logits, paths, in_len, tgt, implementation="xla"
    )
    v = losses.no_blank_ctc_loss(
        logits[..., :V], jnp.round(paths[..., 0]).astype(jnp.int32),
        in_len, tgt[:, 0], implementation="xla",
    )
    o = losses.no_blank_binary_ctc_loss(
        logits[..., V:], paths[..., 1:], in_len, tgt[:, 1],
        implementation="xla",
    )
    np.testing.assert_allclose(
        np.asarray(joint), np.asarray(v) + np.asarray(o), rtol=1e-6
    )


def test_joint_trainer_learns_and_metrics_use_verb_slice():
    batches = _joint_batches(num_batches=6, seed=3)
    model = LSTMHead(hidden=V + O, dropout_rate=0.0)
    tr = Trainer(model, loss_kind="joint", lr=1e-2, implementation="xla",
                 transition_metrics=True)
    s = tr.init_state(batches[0])
    s, m0 = tr.train_epoch(s, batches, epoch=0)
    for e in range(1, 5):
        s, m = tr.train_epoch(s, batches, epoch=e)
    assert m["loss"] < m0["loss"]
    val = tr.validate(s, batches, epoch=0)
    # top-k runs over the 9-verb slice: top5 of 9 classes must be high once
    # the verb head fits (over V+O=14 it could not reach this reliably)
    assert val["top5"] > 60.0
    assert 0.0 <= val["trans_top1"] <= 100.0


def test_joint_under_mesh_and_multi_step():
    """The joint loss rides the shard_map data-parallel step (incl. the
    K-steps-per-dispatch scan-inside-shard_map path) and matches the
    single-device epoch."""
    import jax

    from ctc_tpu.parallel.mesh import make_mesh

    batches = _joint_batches(num_batches=4, seed=5)
    model = LSTMHead(hidden=V + O, dropout_rate=0.0)
    common = dict(loss_kind="joint", lr=1e-2, seed=0, implementation="xla")
    tr_mesh = Trainer(model, mesh=make_mesh(data=8), steps_per_dispatch=2,
                      **common)
    tr_plain = Trainer(model, **common)
    s_m = tr_mesh.init_state(batches[0])
    s_p = tr_plain.init_state(batches[0])
    s_m, m_m = tr_mesh.train_epoch(s_m, batches, epoch=0)
    s_p, m_p = tr_plain.train_epoch(s_p, batches, epoch=0)
    np.testing.assert_allclose(m_m["loss"], m_p["loss"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m_m["top1"], m_p["top1"], rtol=1e-5, atol=1e-6)
    assert int(jax.device_get(s_m.step)) == int(jax.device_get(s_p.step)) == 4
    # validate through the mesh path on the SAME state (params drift on
    # zero-grad leaves under Adam between independently trained states —
    # same caveat as test_steps_per_dispatch_composes_with_mesh)
    val_m = tr_mesh.validate(s_m, batches, epoch=0)
    val_p = tr_plain.validate(s_m, batches, epoch=0)
    np.testing.assert_allclose(
        val_m["loss"], val_p["loss"], rtol=1e-5, atol=1e-6
    )


def test_cli_joint_relation_eval(tmp_path, capsys):
    """CLI e2e: train 2 epochs with --loss joint, then --evaluate prints the
    relation-tagging metrics (mAP, recall@N, precision@N) and decodes the
    verb transition path."""
    import csv

    from ctc_tpu.cli.main import main

    common = [
        "--dataset", "synthetic", "--batch-size", "4",
        "--temporal", "8", "--extract-feat-dim", "16", "--dropout", "0.0",
        "--v-class", str(V), "--o-class", str(O), "--loss", "joint",
        "--cache-dir", str(tmp_path), "--name", "joint",
        "--print-train-freq", "100", "--print-test-freq", "100",
    ]
    history = main(common + ["--epochs", "2"])
    assert history[-1]["train"]["loss"] < history[0]["train"]["loss"]

    metrics = main(common + [
        "--epochs", "2", "--evaluate", "--decode",
        "--resume", str(tmp_path) + "/joint/",
    ])
    out = capsys.readouterr().out
    assert "relation tagging:" in out
    assert np.isfinite(metrics["relation_mAP"])
    assert set(metrics["relation_recall_at"]) == {50, 100}
    assert set(metrics["relation_prec_at"]) == {1, 5, 10}
    assert np.isfinite(metrics["video_mAP"])
    assert np.isfinite(metrics["object_mAP"])
    # decoded verb paths stay in the verb class space
    rows = list(csv.reader(open(metrics["decoded_csv"])))[1:]
    assert len(rows) == 8
    for row in rows:
        assert all(0 <= int(c) < V for c in row[3].split())


def test_collate_joint_ctc_packing():
    """collate_joint_ctc packs the charades prepare() outputs (v_targets +
    o_targets with independent v_time/o_time) into the joint batch
    convention; -1 object padding zeroed."""
    from ctc_tpu.data.loading import collate_joint_ctc

    o_class, L = 4, 3
    data = {
        "v_targets": [np.array([2, 5, -1]), np.array([1, -1, -1])],
        "o_targets": [
            np.array([[0, 1, 0, 0], [1, 0, 0, 0], [-1, -1, -1, -1]],
                     np.float32),
            np.array([[0, 0, 1, 0], [-1, -1, -1, -1], [-1, -1, -1, -1]],
                     np.float32),
        ],
        "v_times": [2, 1],
        "o_times": [2, 1],
        "v_f_targets": [5, 1],
    }
    feats = np.zeros((2, L, 8), np.float32)
    b = collate_joint_ctc(data, [0, 1], feats)
    assert b["paths"].shape == (2, L, 1 + o_class)
    np.testing.assert_array_equal(b["paths"][0, :, 0], [2, 5, -1])
    np.testing.assert_array_equal(b["paths"][0, 0, 1:], [0, 1, 0, 0])
    # -1 padded object rows are zeroed (masked out by target_lengths)
    np.testing.assert_array_equal(b["paths"][1, 1, 1:], [0, 0, 0, 0])
    np.testing.assert_array_equal(b["target_lengths"], [[2, 2], [1, 1]])
    np.testing.assert_array_equal(b["future_target"], [5, 1])
    assert b["input_lengths"].tolist() == [L, L]


def test_joint_object_weight(rng):
    """object_weight rebalances the two heads: weighted loss == verb +
    w * object, and the Trainer knob reaches plain AND sharded steps."""
    import jax

    from ctc_tpu.parallel.mesh import make_mesh

    (batch,) = _joint_batches(num_batches=1)
    t, b = batch["feats"].shape[1], batch["feats"].shape[0]
    logits = jnp.asarray(rng.standard_normal((t, b, V + O)), jnp.float32)
    paths = jnp.asarray(batch["paths"])
    in_len = jnp.asarray(batch["input_lengths"])
    tgt = jnp.asarray(batch["target_lengths"])
    w = 7.0
    got = losses.joint_ov_ctc_loss(
        logits, paths, in_len, tgt, implementation="xla", object_weight=w
    )
    v = losses.no_blank_ctc_loss(
        logits[..., :V], jnp.round(paths[..., 0]).astype(jnp.int32),
        in_len, tgt[:, 0], implementation="xla",
    )
    o = losses.no_blank_binary_ctc_loss(
        logits[..., V:], paths[..., 1:], in_len, tgt[:, 1],
        implementation="xla",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(v) + w * np.asarray(o), rtol=1e-6
    )

    batches = _joint_batches(num_batches=2, seed=9)
    model = LSTMHead(hidden=V + O, dropout_rate=0.0)
    common = dict(loss_kind="joint", lr=1e-2, seed=0, implementation="xla",
                  joint_object_weight=w)
    tr_p = Trainer(model, **common)
    tr_m = Trainer(model, mesh=make_mesh(data=8), steps_per_dispatch=2,
                   **common)
    s_p = tr_p.init_state(batches[0])
    s_m = tr_m.init_state(batches[0])
    s_p, m_p = tr_p.train_epoch(s_p, batches, epoch=0)
    s_m, m_m = tr_m.train_epoch(s_m, batches, epoch=0)
    # weighted loss flows through both paths identically
    np.testing.assert_allclose(m_m["loss"], m_p["loss"], rtol=1e-5,
                               atol=1e-6)
    # and differs from the unweighted trainer's loss
    tr_u = Trainer(model, loss_kind="joint", lr=1e-2, seed=0,
                   implementation="xla")
    s_u = tr_u.init_state(batches[0])
    _, m_u = tr_u.train_epoch(s_u, batches, epoch=0)
    assert abs(m_u["loss"] - m_p["loss"]) > 1e-3
