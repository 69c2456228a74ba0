"""End-to-end pixels model (I3DLSTM) + dual-optimizer training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_tpu.models import I3DLSTM
from ctc_tpu.train import Trainer


def _pixel_batch(rng, batch=1, temporal=2, hidden=5):
    clips = rng.standard_normal(
        (batch, temporal, 10, 224, 224, 3)
    ).astype(np.float32)
    return {
        "feats": clips,
        "paths": np.tile(np.arange(temporal, dtype=np.int32), (batch, 1)),
        "input_lengths": np.full((batch,), temporal, np.int64),
        "target_lengths": np.full((batch,), temporal, np.int64),
        "future_target": np.zeros((batch,), np.int32),
    }


def _max_delta(a, b):
    return max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()), a, b
    )))


@pytest.mark.slow
def test_frozen_backbone_trains_head_only(rng):
    batch = _pixel_batch(rng)
    trainer = Trainer(
        I3DLSTM(hidden=5, freeze_backbone=True), loss_kind="noblank",
        implementation="xla", i3d_optimizer={"finetune": False},
    )
    state0 = trainer.init_state(batch)
    state1, metrics = trainer.train_step(state0, batch, trainer.rng)
    assert np.isfinite(float(metrics["loss"]))
    assert _max_delta(state1.params["i3d"], state0.params["i3d"]) == 0.0
    assert _max_delta(state1.params["head"], state0.params["head"]) > 0.0


@pytest.mark.slow
def test_finetune_updates_backbone(rng):
    # batch >= 2: with batch 1 the head's BatchNorm normalizes every sample
    # to its own mean, so no gradient flows into the backbone at all
    batch = _pixel_batch(rng, batch=2)
    trainer = Trainer(
        I3DLSTM(hidden=5, freeze_backbone=False), loss_kind="noblank",
        implementation="xla",
        i3d_optimizer={"finetune": True, "lr": 1e-2, "momentum": 0.9},
    )
    state0 = trainer.init_state(batch)
    state1, metrics = trainer.train_step(state0, batch, trainer.rng)
    assert np.isfinite(float(metrics["loss"]))
    assert _max_delta(state1.params["i3d"], state0.params["i3d"]) > 0.0
    assert _max_delta(state1.params["head"], state0.params["head"]) > 0.0


@pytest.mark.slow
def test_feat_chunk_matches_unchunked(rng):
    """Chunked feature extraction (feat_chunk) is numerically identical to
    the one-shot folded conv batch: same params, same logits."""
    import jax.numpy as jnp

    batch = _pixel_batch(rng, batch=2, temporal=2)
    clips = jnp.asarray(batch["feats"])
    plain = I3DLSTM(hidden=5, freeze_backbone=True)
    chunked = I3DLSTM(hidden=5, freeze_backbone=True, feat_chunk=2)
    variables = plain.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        clips, train=False,
    )
    out_plain = plain.apply(variables, clips, train=False)
    out_chunked = chunked.apply(variables, clips, train=False)
    logits = out_plain[0] if isinstance(out_plain, tuple) else out_plain
    logits_c = out_chunked[0] if isinstance(out_chunked, tuple) else out_chunked
    np.testing.assert_allclose(
        np.asarray(logits_c), np.asarray(logits), rtol=1e-5, atol=1e-5
    )


def test_feat_chunk_guards():
    with pytest.raises(ValueError, match="freeze_backbone"):
        I3DLSTM(hidden=5, freeze_backbone=False, feat_chunk=2).init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            np.zeros((1, 2, 10, 32, 32, 3), np.float32), train=False,
        )
    with pytest.raises(ValueError, match="divide"):
        I3DLSTM(hidden=5, freeze_backbone=True, feat_chunk=3).init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            np.zeros((1, 2, 10, 32, 32, 3), np.float32), train=False,
        )


@pytest.mark.slow
def test_sharded_frozen_backbone_matches_single_device(rng):
    """Data-parallel pixels mode with a frozen backbone: the sharded step
    prunes the backbone's zero grads from the pmean (frozen_subtrees) and
    still reproduces the single-device step exactly."""
    from ctc_tpu.parallel.mesh import make_mesh

    batch = _pixel_batch(rng, batch=2)
    common = dict(
        loss_kind="noblank", implementation="xla",
        i3d_optimizer={"finetune": False},
    )
    mesh = make_mesh(data=2)
    sharded = Trainer(I3DLSTM(hidden=5, freeze_backbone=True,
                              dropout_rate=0.0), mesh=mesh, **common)
    plain = Trainer(I3DLSTM(hidden=5, freeze_backbone=True,
                            dropout_rate=0.0), **common)
    s_state = sharded.init_state(batch)
    p_state = plain.init_state(batch)
    rng_key = jax.random.PRNGKey(0)
    b_dev = {k: jnp.asarray(v) for k, v in batch.items()}
    # two steps: the second step's loss goes through the first step's
    # updated params, so any real grad divergence shows up here (exact
    # per-param equality is not assertable under Adam — near-zero grads
    # amplify fp-reorder noise into O(lr) deltas, see
    # tests/test_composed_parallel.py)
    for _ in range(2):
        s_state, s_m = sharded.train_step(
            s_state, sharded._place(batch), rng_key
        )
        p_state, p_m = plain.train_step(p_state, b_dev, rng_key)
        np.testing.assert_allclose(
            float(s_m["loss"]), float(p_m["loss"]), rtol=1e-5, atol=1e-6
        )
    assert _max_delta(s_state.params["i3d"], p_state.params["i3d"]) == 0.0
