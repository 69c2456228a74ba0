"""Pallas lattice kernel vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_tpu.ops import lattice_xla
from ctc_tpu.ops.lattice_pallas import noblank_lattice_nll_pallas


def _case(rng, T, B, L, degenerate=False):
    em = (rng.standard_normal((T, B, L)) - 1.0).astype(np.float32)
    in_len = rng.integers(1, T + 1, size=B)
    tgt_len = rng.integers(1, L + 1, size=B)
    in_len[0], tgt_len[0] = T, L
    if not degenerate:
        tgt_len = np.minimum(tgt_len, in_len)
    return jnp.asarray(em), jnp.asarray(in_len), jnp.asarray(tgt_len)


@pytest.mark.parametrize(
    "T,B,L",
    [(16, 4, 10), (128, 8, 32), (37, 11, 157)],
    ids=["small", "baseline", "odd-sizes"],
)
def test_pallas_matches_xla(rng, T, B, L):
    em, in_len, tgt_len = _case(rng, T, B, L)
    cot = jnp.asarray(rng.standard_normal(B).astype(np.float32))

    def via_xla(e):
        return jnp.sum(lattice_xla.noblank_lattice_nll(e, in_len, tgt_len) * cot)

    def via_pallas(e):
        return jnp.sum(
            noblank_lattice_nll_pallas(e, in_len, tgt_len, interpret=True) * cot
        )

    v_x, g_x = jax.value_and_grad(via_xla)(em)
    v_p, g_p = jax.value_and_grad(via_pallas)(em)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize(
    "tiles", [(8, 8), (16, 16), (32, 8)], ids=["8x8", "16x16", "32x8"]
)
def test_pallas_chunked_grid_matches_xla(rng, tiles):
    """Force the multi-chunk carry path (several time chunks per batch tile,
    batch tile wider than B, T not a chunk multiple)."""
    T, B, L = 28, 5, 21  # t_pad/chunk > 1, batch and L all need padding
    em, in_len, tgt_len = _case(rng, T, B, L)
    cot = jnp.asarray(rng.standard_normal(B).astype(np.float32))

    def via_xla(e):
        return jnp.sum(lattice_xla.noblank_lattice_nll(e, in_len, tgt_len) * cot)

    def via_pallas(e):
        return jnp.sum(
            noblank_lattice_nll_pallas(
                e, in_len, tgt_len, interpret=True, tiles=tiles
            )
            * cot
        )

    v_x, g_x = jax.value_and_grad(via_xla)(em)
    v_p, g_p = jax.value_and_grad(via_pallas)(em)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize(
    "tiles", [None, (8, 8), (16, 16)], ids=["auto", "8x8", "16x16"]
)
def test_pallas_tlb_layout_matches_xla(rng, tiles):
    """Native [T, L, B] layout (label on sublanes) — values and grads."""
    T, B, L = 28, 5, 21
    em, in_len, tgt_len = _case(rng, T, B, L)
    em_tlb = jnp.transpose(em, (0, 2, 1))
    cot = jnp.asarray(rng.standard_normal(B).astype(np.float32))

    def via_xla(e):
        return jnp.sum(lattice_xla.noblank_lattice_nll(e, in_len, tgt_len) * cot)

    def via_pallas_tlb(e_tlb):
        return jnp.sum(
            noblank_lattice_nll_pallas(
                e_tlb, in_len, tgt_len, layout="tlb", interpret=True,
                tiles=tiles,
            )
            * cot
        )

    v_x, g_x = jax.value_and_grad(via_xla)(em)
    v_p, g_p = jax.value_and_grad(via_pallas_tlb)(em_tlb)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(g_p, (0, 2, 1))), np.asarray(g_x),
        rtol=2e-3, atol=2e-5,
    )


def test_pallas_degenerate_lengths(rng):
    em, in_len, tgt_len = _case(rng, 24, 4, 12, degenerate=True)
    in_len = in_len.at[1].set(3)  # target_length may exceed input_length
    nll_x = lattice_xla.noblank_lattice_nll(em, in_len, tgt_len)
    nll_p = noblank_lattice_nll_pallas(em, in_len, tgt_len, interpret=True)
    np.testing.assert_allclose(
        np.asarray(nll_p), np.asarray(nll_x), rtol=1e-5, atol=1e-5
    )
    g_x = jax.grad(lambda e: jnp.sum(lattice_xla.noblank_lattice_nll(e, in_len, tgt_len)))(em)
    g_p = jax.grad(
        lambda e: jnp.sum(noblank_lattice_nll_pallas(e, in_len, tgt_len, interpret=True))
    )(em)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-3, atol=2e-5)


def test_emission_builders_layouts_agree(rng):
    """tlb emissions are exactly the transpose of tbl for both builders, and
    dispatch.lattice_nll(layout='tlb') matches the tbl result on the XLA
    path (the layout plumbing the TPU loss path uses)."""
    from ctc_tpu.ops import dispatch
    from ctc_tpu.ops.emissions import (
        binary_ce_emissions,
        gather_log_softmax_emissions,
    )

    T, B, C, L = 12, 5, 9, 7
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    paths = jnp.asarray(rng.integers(-1, C, size=(B, L)).astype(np.int32))
    mh = jnp.asarray((rng.random((B, L, C)) < 0.2).astype(np.float32))

    e_tbl = gather_log_softmax_emissions(logits, paths)
    e_tlb = gather_log_softmax_emissions(logits, paths, layout="tlb")
    # tlb pads the label axis to the sublane multiple (8): the first L rows
    # are the transpose of tbl; padded rows are outside-masked in the DP.
    assert e_tlb.shape == (T, 8, B)
    np.testing.assert_array_equal(
        np.asarray(e_tlb[:, :L]), np.asarray(jnp.transpose(e_tbl, (0, 2, 1)))
    )
    b_tbl = binary_ce_emissions(logits, mh)
    b_tlb = binary_ce_emissions(logits, mh, layout="tlb")
    np.testing.assert_allclose(
        np.asarray(b_tlb[:, :L]), np.asarray(jnp.transpose(b_tbl, (0, 2, 1))),
        rtol=1e-6, atol=1e-6,
    )

    in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
    tgt_len = jnp.asarray(
        np.minimum(np.asarray(rng.integers(1, L + 1, size=B)), np.asarray(in_len))
    )
    nll_tbl = dispatch.lattice_nll(
        e_tbl, in_len, tgt_len, implementation="xla"
    )
    nll_tlb = dispatch.lattice_nll(
        e_tlb, in_len, tgt_len, implementation="xla", layout="tlb"
    )
    np.testing.assert_allclose(
        np.asarray(nll_tlb), np.asarray(nll_tbl), rtol=1e-6, atol=1e-6
    )
