"""Sequence-sharded lattice pipeline + sharded greedy decode vs the
single-device implementations, on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ctc_tpu.decode import greedy_decode
from ctc_tpu.ops import lattice_xla
from ctc_tpu.parallel.seq_lattice import (
    make_seq_sharded_greedy_decode,
    make_seq_sharded_lattice_nll,
    shard_time_axis,
)


@pytest.fixture(scope="module")
def seq_mesh():
    devices = np.asarray(jax.devices()[:4])
    return Mesh(devices, ("seq",))


def test_seq_sharded_nll_matches_reference(rng, seq_mesh):
    T, B, L = 32, 8, 12  # T divisible by 4 shards, B by 4 microbatches
    em = jnp.asarray((rng.standard_normal((T, B, L)) - 1).astype(np.float32))
    in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
    tgt_len = jnp.asarray(
        np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len))
    )

    want, _ = lattice_xla.noblank_lattice_forward(em, in_len, tgt_len)
    fn = make_seq_sharded_lattice_nll(seq_mesh)
    got = fn(shard_time_axis(em, seq_mesh), in_len, tgt_len)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_seq_sharded_decode_matches_reference(rng, seq_mesh):
    T, B, C = 32, 6, 9
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    in_len = jnp.asarray([32, 20, 9, 1, 32, 15])

    want_dec, want_len, _ = greedy_decode(logits, in_len)
    fn = make_seq_sharded_greedy_decode(seq_mesh)
    got_dec, got_len = fn(shard_time_axis(logits, seq_mesh), in_len)
    np.testing.assert_array_equal(np.asarray(got_len), np.asarray(want_len))
    np.testing.assert_array_equal(np.asarray(got_dec), np.asarray(want_dec))


def test_seq_sharded_decode_boundary_repeats(seq_mesh):
    """A label repeated across a shard boundary must collapse to one."""
    T, B, C = 32, 2, 4
    logits = np.full((T, B, C), -5.0, np.float32)
    # class 2 active from t=6..10 (spans the t=8 shard boundary with 4 shards)
    logits[6:11, :, 2] = 5.0
    logits[20:22, :, 3] = 5.0
    logits_j = jnp.asarray(logits)
    in_len = jnp.asarray([T, T])
    fn = make_seq_sharded_greedy_decode(seq_mesh)
    dec, lens = fn(shard_time_axis(logits_j, seq_mesh), in_len)
    assert np.asarray(lens).tolist() == [2, 2]
    assert np.asarray(dec[0, :2]).tolist() == [2, 3]


def test_seq_sharded_binary_matches_unsharded(rng, seq_mesh):
    """mode='binary': shard-local BCE emissions + pipeline vs the unsharded
    NoBlankBinaryCTC loss (per-sample NLL)."""
    from ctc_tpu import losses

    T, B, C, L = 32, 8, 13, 6
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    paths = jnp.asarray((rng.random((B, L, C)) < 0.25).astype(np.float32))
    in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
    tgt_len = jnp.asarray(
        np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len))
    )

    want = losses.no_blank_binary_ctc_loss(
        logits, paths, in_len, tgt_len, reduction="none", implementation="xla"
    )
    fn = make_seq_sharded_lattice_nll(seq_mesh, mode="binary")
    got = fn(shard_time_axis(logits, seq_mesh), paths, in_len, tgt_len)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_seq_sharded_blank_matches_unsharded(rng, seq_mesh):
    """mode='blank': vs the unsharded blank ctc_loss (torch semantics),
    including repeated labels (skip gating) and varying lengths."""
    from ctc_tpu import losses

    T, B, C, L = 32, 8, 10, 7
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    targets = np.asarray(rng.integers(1, C, size=(B, L)), np.int32)
    targets[:, 1::2] = targets[:, ::2][:, : targets[:, 1::2].shape[1]]
    targets = jnp.asarray(targets)
    in_len = jnp.asarray(rng.integers(2 * L + 1, T + 1, size=B))
    tgt_len = jnp.asarray(rng.integers(0, L + 1, size=B))

    want = losses.ctc_loss(
        logits, targets, in_len, tgt_len, reduction="none",
        implementation="xla",
    )
    fn = make_seq_sharded_lattice_nll(seq_mesh, mode="blank")
    got = fn(shard_time_axis(logits, seq_mesh), targets, in_len, tgt_len)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def _rand_case(rng, T, B, C, L, feasible_blank=False):
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    in_len = jnp.asarray(np.full((B,), T, np.int64))
    max_l = L if not feasible_blank else min(L, T // 2 - 1)
    tgt_len = jnp.asarray(rng.integers(1, max_l + 1, size=B))
    int_paths = jnp.asarray(rng.integers(0, C, size=(B, L)).astype(np.int32))
    mh_paths = jnp.asarray((rng.random((B, L, C)) < 0.3).astype(np.float32))
    return logits, int_paths, mh_paths, in_len, tgt_len


@pytest.mark.parametrize("mode", ["noblank", "noblank_logits", "binary",
                                  "blank"])
def test_seq_sharded_grad_matches_unsharded(rng, seq_mesh, mode):
    """jax.grad through the pipeline (ppermute/psum transposes) must match
    the unsharded analytic custom_vjp — the property that makes the
    seq-sharded lattice *trainable*, not just evaluable."""
    from ctc_tpu import losses

    T, B, C, L = 32, 8, 9, 12
    logits, int_paths, mh_paths, in_len, tgt_len = _rand_case(
        rng, T, B, C, L, feasible_blank=(mode == "blank")
    )
    em = jnp.asarray((rng.standard_normal((T, B, L)) - 1).astype(np.float32))

    fn = make_seq_sharded_lattice_nll(seq_mesh, mode=mode)
    if mode == "noblank":
        sharded = lambda x: jnp.sum(fn(shard_time_axis(x, seq_mesh),
                                       in_len, tgt_len))
        unsharded = lambda x: jnp.sum(
            lattice_xla.noblank_lattice_nll(x, in_len, tgt_len)
        )
        arg = em
    else:
        paths = {"noblank_logits": int_paths, "binary": mh_paths,
                 "blank": int_paths}[mode]
        loss = {"noblank_logits": losses.no_blank_ctc_loss,
                "binary": losses.no_blank_binary_ctc_loss,
                "blank": losses.ctc_loss}[mode]
        sharded = lambda x: jnp.sum(fn(shard_time_axis(x, seq_mesh),
                                       paths, in_len, tgt_len))
        unsharded = lambda x: jnp.sum(loss(
            x, paths, in_len, tgt_len, reduction="none", implementation="xla"
        ))
        arg = logits

    v_s, g_s = jax.value_and_grad(sharded)(arg)
    v_u, g_u = jax.value_and_grad(unsharded)(arg)
    np.testing.assert_allclose(float(v_s), float(v_u), rtol=1e-5, atol=1e-5)
    # atol 1e-5 (not 1e-6): on an oversubscribed host the 8-virtual-device
    # psum/ppermute reduction order varies with thread scheduling, and
    # near-zero grad entries flake at 1e-6 under full-suite load (observed
    # once in-suite, 5/5 clean in isolation); rtol still pins every
    # non-tiny entry to f32 parity.
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_u), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("m", [8, 16])
def test_seq_sharded_microbatch_knob(rng, seq_mesh, m):
    """num_microbatches > shard count (the bubble-shrinking knob) must not
    change values."""
    T, B, L = 32, 16, 12
    em = jnp.asarray((rng.standard_normal((T, B, L)) - 1).astype(np.float32))
    in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
    tgt_len = jnp.asarray(
        np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len))
    )
    want, _ = lattice_xla.noblank_lattice_forward(em, in_len, tgt_len)
    fn = make_seq_sharded_lattice_nll(seq_mesh, num_microbatches=m)
    got = fn(shard_time_axis(em, seq_mesh), in_len, tgt_len)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_trainer_seq_parallel_matches_plain(tmp_path):
    """Trainer(seq_parallel=4): one long-T train step equals the plain
    trainer's step (the --seq-parallel product path)."""
    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.train import Trainer

    batches = synthetic_feature_batches(
        num_batches=1, batch_size=8, temporal=32, feat_dim=16,
        num_classes=9, max_path=12, seed=2,
    )
    model = LSTMHead(hidden=9, dropout_rate=0.0)
    common = dict(loss_kind="noblank", lr=1e-3, seed=0, implementation="xla")
    tr_seq = Trainer(model, seq_parallel=4, seq_microbatches=8, **common)
    tr_plain = Trainer(model, **common)
    s_seq = tr_seq.init_state(batches[0])
    s_plain = tr_plain.init_state(batches[0])
    b = {k: jnp.asarray(v) for k, v in batches[0].items()}
    rng_key = jax.random.PRNGKey(0)
    # several sequential Adam steps: per-step loss equality through evolving
    # params proves the two paths train identically (raw param comparison
    # would only expose Adam's noise amplification on dead params — see
    # test_parallel.py's SGD note)
    for _ in range(3):
        s_seq, m_seq = tr_seq.train_step(s_seq, b, rng_key)
        s_plain, m_plain = tr_plain.train_step(s_plain, b, rng_key)
        np.testing.assert_allclose(
            float(m_seq["loss"]), float(m_plain["loss"]),
            rtol=1e-4, atol=1e-5,
        )
    np.testing.assert_allclose(
        float(tr_seq.eval_step(s_seq, b)["loss"]),
        float(tr_plain.eval_step(s_plain, b)["loss"]),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("mode", ["noblank", "noblank_logits", "binary"])
def test_seq_sharded_pallas_pipeline_matches(rng, seq_mesh, mode):
    """implementation='pallas' (boundary-init kernel shards, interpret mode
    on CPU): value AND grad parity vs both the XLA-shard pipeline and the
    unsharded analytic custom_vjp, with per-sample lengths landing on
    different shards (final-cell ownership) and partial-shard targets."""
    from ctc_tpu import losses

    T, B, C, L = 32, 8, 9, 12
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    em = jnp.asarray((rng.standard_normal((T, B, L)) - 1).astype(np.float32))
    int_paths = jnp.asarray(rng.integers(0, C, size=(B, L)).astype(np.int32))
    mh_paths = jnp.asarray((rng.random((B, L, C)) < 0.3).astype(np.float32))
    # lengths spread over every shard (T/4 = 8 per shard)
    in_len = jnp.asarray([1, 7, 8, 9, 16, 17, 25, 32])
    tgt_len = jnp.asarray(
        np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len))
    )

    fn_k = make_seq_sharded_lattice_nll(
        seq_mesh, mode=mode, implementation="pallas", interpret=True
    )
    fn_x = make_seq_sharded_lattice_nll(
        seq_mesh, mode=mode, implementation="xla"
    )
    if mode == "noblank":
        args = (in_len, tgt_len)
        arg = em
        unsharded = lambda x: jnp.sum(
            lattice_xla.noblank_lattice_nll(x, in_len, tgt_len)
        )
    else:
        paths = int_paths if mode == "noblank_logits" else mh_paths
        loss = (losses.no_blank_ctc_loss if mode == "noblank_logits"
                else losses.no_blank_binary_ctc_loss)
        args = (paths, in_len, tgt_len)
        arg = logits
        unsharded = lambda x: jnp.sum(loss(
            x, paths, in_len, tgt_len, reduction="none", implementation="xla"
        ))

    def run(fn):
        f = lambda x: jnp.sum(fn(shard_time_axis(x, seq_mesh), *args))
        return jax.value_and_grad(f)(arg)

    v_k, g_k = run(fn_k)
    v_x, g_x = run(fn_x)
    v_u, g_u = jax.value_and_grad(unsharded)(arg)
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(v_k), float(v_u), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_x), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_u), rtol=1e-5, atol=1e-5
    )


def test_seq_sharded_pallas_microbatch_knob(rng, seq_mesh):
    """The bubble knob composes with the kernel pipeline."""
    T, B, L = 32, 16, 12
    em = jnp.asarray((rng.standard_normal((T, B, L)) - 1).astype(np.float32))
    in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
    tgt_len = jnp.asarray(
        np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len))
    )
    want, _ = lattice_xla.noblank_lattice_forward(em, in_len, tgt_len)
    fn = make_seq_sharded_lattice_nll(
        seq_mesh, num_microbatches=8, implementation="pallas", interpret=True
    )
    got = fn(shard_time_axis(em, seq_mesh), in_len, tgt_len)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_seq_sharded_pallas_blank_matches(rng, seq_mesh):
    """Blank mode under implementation='pallas': the boundary-init blank
    kernel pipeline (stay/advance/skip, 3-way-softmax boundary cotangents)
    matches the XLA pipeline and the unsharded blank loss — value + grad,
    with repeated labels (skip gating), L=0 samples, and finals owned by
    interior shards."""
    from ctc_tpu import losses

    T, B, C, L = 32, 8, 10, 7
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    targets = np.asarray(rng.integers(1, C, size=(B, L)), np.int32)
    targets[:, 1::2] = targets[:, ::2][:, : targets[:, 1::2].shape[1]]
    targets = jnp.asarray(targets)
    in_len = jnp.asarray([15, 16, 17, 24, 32, 32, 20, 9])
    tgt_len = jnp.asarray([3, 7, 0, 5, 7, 1, 6, 2])

    fn_k = make_seq_sharded_lattice_nll(
        seq_mesh, mode="blank", implementation="pallas", interpret=True
    )
    fn_x = make_seq_sharded_lattice_nll(
        seq_mesh, mode="blank", implementation="xla"
    )

    def run(fn):
        f = lambda x: jnp.sum(fn(shard_time_axis(x, seq_mesh), targets,
                                 in_len, tgt_len))
        return jax.value_and_grad(f)(logits)

    v_k, g_k = run(fn_k)
    v_x, g_x = run(fn_x)
    unsharded = lambda x: jnp.sum(losses.ctc_loss(
        x, targets, in_len, tgt_len, reduction="none", implementation="xla"
    ))
    v_u, g_u = jax.value_and_grad(unsharded)(logits)
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(v_k), float(v_u), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_x), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_u), rtol=1e-5, atol=1e-5
    )


def test_seq_sharded_pallas_composes_with_data_axis(rng):
    """Kernel shards under the composed data×seq mesh (batch over 'data',
    T pipeline over 'seq') match the unsharded loss."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ctc_tpu import losses

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "seq"))
    T, B, C, L = 16, 8, 9, 6
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    paths = jnp.asarray(rng.integers(0, C, size=(B, L)).astype(np.int32))
    in_len = jnp.asarray(np.full((B,), T))
    tgt_len = jnp.asarray(rng.integers(1, L + 1, size=B))

    fn = make_seq_sharded_lattice_nll(
        mesh, mode="noblank_logits", batch_axis="data",
        implementation="pallas", interpret=True,
    )
    placed = jax.device_put(
        logits, NamedSharding(mesh, P("seq", "data"))
    )
    got = fn(placed, paths, in_len, tgt_len)
    want = losses.no_blank_ctc_loss(
        logits, paths, in_len, tgt_len, reduction="none",
        implementation="xla",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
