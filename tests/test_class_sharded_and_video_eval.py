"""Class-axis-sharded binary CTC vs the unsharded loss; video-eval driver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ctc_tpu import losses
from ctc_tpu.eval.video import (
    aggregate_video_scores,
    evaluate_videos,
    video_relation_eval,
    video_verb_map,
)
from ctc_tpu.parallel.class_sharded import (
    make_class_sharded_binary_nll,
    shard_class_axis,
)


@pytest.fixture(scope="module")
def model_mesh():
    return Mesh(np.asarray(jax.devices()[:4]), ("model",))


def test_class_sharded_binary_matches_unsharded(rng, model_mesh):
    T, B, L, C = 16, 4, 6, 30  # C not a multiple of 4 -> padded to 32
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    paths = (rng.random((B, L, C)) < 0.2).astype(np.float32)
    in_len = np.full((B,), T)
    tgt_len = rng.integers(1, L + 1, size=B)

    want = losses.no_blank_binary_ctc_loss(
        jnp.asarray(logits), jnp.asarray(paths), jnp.asarray(in_len),
        jnp.asarray(tgt_len), implementation="xla",
    )

    pad = 2
    logits_p = np.pad(logits, ((0, 0), (0, 0), (0, pad)))
    paths_p = np.pad(paths, ((0, 0), (0, 0), (0, pad)))
    fn = make_class_sharded_binary_nll(
        model_mesh, num_classes=C, implementation="xla"
    )
    got = fn(
        shard_class_axis(jnp.asarray(logits_p), model_mesh),
        shard_class_axis(jnp.asarray(paths_p), model_mesh),
        jnp.asarray(in_len),
        jnp.asarray(tgt_len),
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)

    # gradients flow to the local class shards correctly
    g_want = jax.grad(
        lambda lg: losses.no_blank_binary_ctc_loss(
            lg, jnp.asarray(paths), jnp.asarray(in_len), jnp.asarray(tgt_len),
            implementation="xla",
        )
    )(jnp.asarray(logits))
    g_got = jax.grad(
        lambda lg: fn(
            shard_class_axis(lg, model_mesh),
            shard_class_axis(jnp.asarray(paths_p), model_mesh),
            jnp.asarray(in_len), jnp.asarray(tgt_len),
        )
    )(jnp.asarray(logits_p))
    np.testing.assert_allclose(
        np.asarray(g_got)[..., :C], np.asarray(g_want), rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_got)[..., C:], 0.0, atol=1e-7
    )


def test_video_verb_map_perfect_predictions():
    gt = {"a": [[1, 2, 3]], "b": [[1, 4, 7]], "c": [[0, 0, 3]]}
    scores = {}
    for vid, rows in gt.items():
        s = np.zeros(10)
        for _, _, v in rows:
            s[v] = 5.0
        scores[vid] = s
    m_ap, _, _ = video_verb_map(scores, gt, num_verbs=10)
    np.testing.assert_allclose(m_ap, 1.0)


def test_video_relation_eval_runs():
    gt = {"a": [[1, 2, 3], [1, 5, 6]]}
    o = {"a": np.random.default_rng(0).standard_normal(38)}
    v = {"a": np.random.default_rng(1).standard_normal(33)}
    o["a"][2] += 10
    v["a"][3] += 10
    m_ap, rec, prec = video_relation_eval(o, v, gt)
    assert 0.0 <= m_ap <= 1.0
    assert set(rec) == {50, 100}


def test_evaluate_videos_end_to_end(rng):
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.train import Trainer
    from ctc_tpu.data import synthetic_feature_batches

    (batch,) = synthetic_feature_batches(
        num_batches=1, batch_size=8, temporal=6, feat_dim=32, num_classes=9
    )
    trainer = Trainer(LSTMHead(hidden=9), implementation="xla")
    state = trainer.init_state(batch)

    data = {
        "features": batch["feats"],
        "ids": ["v0"] * 4 + ["v1"] * 4,
    }
    gt = {"v0": [[0, 1, 2]], "v1": [[0, 3, 4]]}
    out = evaluate_videos(
        LSTMHead(hidden=9), state, data, gt, num_verbs=9
    )
    assert np.isfinite(out["mAP"])
    assert set(out["video_scores"]) == {"v0", "v1"}


def test_evaluate_own_video_csv(tmp_path):
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.train import Trainer
    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.eval.video import evaluate_own_video

    (batch,) = synthetic_feature_batches(
        num_batches=1, batch_size=6, temporal=6, feat_dim=32, num_classes=9
    )
    trainer = Trainer(LSTMHead(hidden=9), implementation="xla")
    state = trainer.init_state(batch)

    data = {"features": batch["feats"], "ids": ["YUME0"] * 4 + ["YUME1"] * 2}
    out_csv = str(tmp_path / "preds.csv")
    out = evaluate_own_video(
        LSTMHead(hidden=9), state, data, out_csv=out_csv, topk=3
    )
    assert out["topk"].shape == (6, 3)
    rows = open(out_csv).read().strip().splitlines()
    assert rows[0] == "id,window,top1,top2,top3"
    assert len(rows) == 7
    # per-video window indices restart at 0
    assert rows[1].startswith("YUME0,0,") and rows[5].startswith("YUME1,0,")


def test_video_map_object_column():
    """gt_col=1 scores the object column — the path CLI uses for multi-hot
    (o_class-wide) heads, where verb indices would be the wrong space."""
    from ctc_tpu.eval.video import video_verb_map

    scores = {"v0": np.eye(38)[4], "v1": np.eye(38)[7]}
    gt = {"v0": [[0, 4, 30]], "v1": [[0, 7, 31]]}
    m_ap, _, _ = video_verb_map(scores, gt, num_verbs=38, gt_col=1)
    assert m_ap == 1.0
