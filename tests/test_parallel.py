"""Sharded training on the 8-virtual-device CPU mesh: the shard_map/psum step
must match the single-device step numerically and actually learn."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_tpu.data import synthetic_feature_batches
from ctc_tpu.models import LSTMHead
from ctc_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from ctc_tpu.train import Trainer
from ctc_tpu.train.trainer import TrainState, make_train_step, torch_style_adam


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh(data=8)


def _setup(batches, hidden, lr=1e-3, sgd=False):
    import optax
    model = LSTMHead(hidden=hidden, dropout_rate=0.0)
    feats = jnp.transpose(jnp.asarray(batches[0]["feats"]), (1, 0, 2))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats,
        train=True,
    )
    tx = optax.sgd(lr) if sgd else torch_style_adam(lr)
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    return model, state


def test_sharded_step_matches_single_device(mesh):
    batches = synthetic_feature_batches(
        num_batches=2, batch_size=16, temporal=8, feat_dim=32,
        num_classes=10, seed=3,
    )
    # plain SGD: Adam would amplify float-noise gradients of dead params
    # (proj bias is cancelled by BatchNorm) into +/-lr sign flips
    model, state = _setup(batches, hidden=10, sgd=True)

    single = make_train_step(model, "noblank", implementation="xla")
    sharded = make_sharded_train_step(model, mesh, "noblank", implementation="xla")

    rng = jax.random.PRNGKey(42)
    batch = {k: jnp.asarray(v) for k, v in batches[0].items()}
    s1, m1 = single(state, batch, rng)

    state_r = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=jax.tree_util.tree_map(
            lambda x: replicate(x, mesh) if hasattr(x, "shape") else x,
            state.opt_state,
        ),
    )
    s2, m2 = sharded(state_r, shard_batch(batches[0], mesh), rng)

    # loss identical; grads/params equal to float tolerance (dropout=0,
    # pmean-of-shards == full-batch mean for equal shard sizes)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(m1["top1"]), float(m2["top1"]), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_sharded_training_learns(mesh):
    batches = synthetic_feature_batches(
        num_batches=4, batch_size=16, temporal=8, feat_dim=32,
        num_classes=10, seed=4,
    )
    model, state = _setup(batches, hidden=10, lr=5e-3)
    step = make_sharded_train_step(model, mesh, "noblank", implementation="xla")
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
    )
    rng = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(6):
        for b in batches:
            state, metrics = step(state, shard_batch(b, mesh), rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.95, losses


@pytest.mark.parametrize("loss_kind", ["noblank", "binary", "blank"])
def test_sharded_step_pallas_interpret_matches_xla(mesh, loss_kind):
    """The Pallas kernels under shard_map: every lattice loss trains
    identically with implementation='pallas' (interpret mode on the CPU
    mesh) and 'xla' — the escape-hatch parity the distributed path must
    honor (round-2 finding: `implementation` was dropped for blank)."""
    import warnings

    # max_path=4 < T=8 keeps every blank-CTC lattice feasible (L=T plus a
    # repeated label has no valid alignment; gradients through those
    # all-sentinel cells are ill-defined and differ between backends)
    batches = synthetic_feature_batches(
        num_batches=1, batch_size=16, temporal=8, feat_dim=32,
        num_classes=10, seed=5, max_path=4, binary=(loss_kind == "binary"),
    )
    model, state = _setup(batches, hidden=10, sgd=True)
    rng = jax.random.PRNGKey(7)
    sb = shard_batch(batches[0], mesh)

    step_x = make_sharded_train_step(
        model, mesh, loss_kind, implementation="xla"
    )
    s_x, m_x = step_x(state, sb, rng)

    step_p = make_sharded_train_step(
        model, mesh, loss_kind, implementation="pallas", interpret=True
    )
    with warnings.catch_warnings():
        # a silent Pallas->XLA fallback (losses/blank.py) would make this
        # test vacuous; its warning becomes an error instead
        warnings.simplefilter("error")
        s_p, m_p = step_p(state, sb, rng)

    np.testing.assert_allclose(
        float(m_p["loss"]), float(m_x["loss"]), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_x.params),
        jax.tree_util.tree_leaves(s_p.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
