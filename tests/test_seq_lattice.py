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
