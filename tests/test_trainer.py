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
