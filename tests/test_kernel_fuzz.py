"""Randomized-configuration parity sweep for the lattice kernels.

The shaped tests in test_pallas_lattice.py / test_blank_pallas.py pin known
geometries; this sweep draws random (T, B, L, C, lengths, tiles) configs —
including ragged lengths, L==1, L==T, tiny T, non-divisible tiles — and
asserts the Pallas kernels (interpret mode) match the XLA scan in value AND
gradient for all three lattice modes.  Seeded, so failures reproduce.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_tpu import losses
from ctc_tpu.ops import dispatch
from ctc_tpu.ops.lattice_pallas import noblank_lattice_nll_pallas


def _rand_cfg(rng):
    t = int(rng.integers(2, 40))
    b = int(rng.integers(1, 12))
    max_l = int(rng.integers(1, min(t, 24) + 1))
    c = int(rng.integers(max_l + 1, 40))
    in_len = rng.integers(1, t + 1, size=b)
    tgt_len = np.minimum(rng.integers(1, max_l + 1, size=b), in_len)
    tiles = (int(rng.choice([8, 16, 128])), int(rng.choice([8, 16])))
    return t, b, max_l, c, in_len, tgt_len, tiles


@pytest.mark.parametrize("seed", range(8))
def test_noblank_fuzz_interpret_matches_xla(seed):
    rng = np.random.default_rng(100 + seed)
    t, b, max_l, c, in_len, tgt_len, tiles = _rand_cfg(rng)
    l_pad = max_l + (-max_l) % 8
    em = jnp.asarray(
        rng.standard_normal((t, l_pad, b)).astype(np.float32) - 1
    )
    in_l, tgt_l = jnp.asarray(in_len), jnp.asarray(tgt_len)

    def f_pallas(e):
        return noblank_lattice_nll_pallas(
            e, in_l, tgt_l, layout="tlb", interpret=True, tiles=tiles
        )

    def f_xla(e):
        return dispatch.lattice_nll(
            e, in_l, tgt_l, implementation="xla", layout="tlb"
        )

    np.testing.assert_allclose(
        np.asarray(f_pallas(em)), np.asarray(f_xla(em)),
        rtol=1e-5, atol=1e-5,
        err_msg=f"value mismatch at cfg {(t, b, max_l, tiles)}",
    )
    g_p = jax.grad(lambda e: jnp.sum(f_pallas(e)))(em)
    g_x = jax.grad(lambda e: jnp.sum(f_xla(e)))(em)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5,
        err_msg=f"grad mismatch at cfg {(t, b, max_l, tiles)}",
    )


@pytest.mark.parametrize("seed", range(4))
def test_binary_fuzz_interpret_matches_xla(seed):
    rng = np.random.default_rng(200 + seed)
    t, b, max_l, c, in_len, tgt_len, _ = _rand_cfg(rng)
    logits = jnp.asarray(rng.standard_normal((t, b, c)).astype(np.float32))
    paths = jnp.asarray((rng.random((b, max_l, c)) < 0.3).astype(np.float32))
    in_l, tgt_l = jnp.asarray(in_len), jnp.asarray(tgt_len)

    def f(e, impl, interp):
        return losses.no_blank_binary_ctc_loss(
            e, paths, in_l, tgt_l, implementation=impl, interpret=interp
        )

    np.testing.assert_allclose(
        float(f(logits, "pallas", True)), float(f(logits, "xla", False)),
        rtol=1e-5, atol=1e-5,
    )
    g_p = jax.grad(lambda e: f(e, "pallas", True))(logits)
    g_x = jax.grad(lambda e: f(e, "xla", False))(logits)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5,
        err_msg=f"grad mismatch at cfg {(t, b, max_l, c)}",
    )


@pytest.mark.parametrize("seed", range(4))
def test_blank_fuzz_interpret_matches_xla(seed):
    rng = np.random.default_rng(300 + seed)
    t = int(rng.integers(4, 32))
    b = int(rng.integers(1, 8))
    c = int(rng.integers(3, 30))
    max_l = int(rng.integers(1, max(t // 2, 2)))
    in_len = rng.integers(max(2 * max_l, 1), t + 1, size=b)
    tgt_len = np.minimum(rng.integers(1, max_l + 1, size=b),
                         in_len // 2)
    tgt_len = np.maximum(tgt_len, 1)
    targets = jnp.asarray(
        rng.integers(1, c, size=(b, max_l)).astype(np.int32)
    )
    logits = jnp.asarray(rng.standard_normal((t, b, c)).astype(np.float32))
    in_l, tgt_l = jnp.asarray(in_len), jnp.asarray(tgt_len)

    def f(e, impl, interp):
        return losses.ctc_loss(
            e, targets, in_l, tgt_l, implementation=impl, interpret=interp
        )

    np.testing.assert_allclose(
        float(f(logits, "pallas", True)), float(f(logits, "xla", False)),
        rtol=1e-5, atol=1e-5,
    )
    g_p = jax.grad(lambda e: f(e, "pallas", True))(logits)
    g_x = jax.grad(lambda e: f(e, "xla", False))(logits)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=2e-4,
        err_msg=f"grad mismatch at cfg {(t, b, max_l, c)}",
    )
