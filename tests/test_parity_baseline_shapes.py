"""Parity at the BASELINE.json shapes (B=8, T=128, C=157) against the fast
torch oracle, plus internal consistency checks (analytic VJP vs autodiff,
property/edge cases from SURVEY.md §4)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ctc_tpu import losses
from ctc_tpu.ops import lattice_xla
from ctc_tpu.ops.emissions import gather_log_softmax_emissions

from torch_oracle import noblank_ctc_loss, noblank_binary_ctc_loss

B, T, C = 8, 128, 157
L = 32


def _case(rng, binary=False):
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    in_len = rng.integers(1, T + 1, size=B)
    tgt_len = rng.integers(1, L + 1, size=B)
    in_len[0], tgt_len[0] = T, L
    # lattice requires target_length <= input_length for a nonzero path
    tgt_len = np.minimum(tgt_len, in_len)
    if binary:
        paths = (rng.random((B, L, C)) < 0.1).astype(np.float32)
    else:
        paths = rng.integers(0, C, size=(B, L)).astype(np.int32)
        for b in range(B):
            paths[b, tgt_len[b]:] = -1
    return logits, paths, in_len, tgt_len


def test_noblank_baseline_shape_parity(rng):
    logits, paths, in_len, tgt_len = _case(rng)
    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = noblank_ctc_loss(
        t_logits, torch.tensor(paths), torch.tensor(in_len), torch.tensor(tgt_len)
    )
    t_loss.backward()

    fn = jax.jit(
        lambda lg: losses.no_blank_ctc_loss(
            lg, jnp.asarray(paths), jnp.asarray(in_len), jnp.asarray(tgt_len),
            implementation="xla",
        )
    )
    j_loss, j_grad = jax.value_and_grad(fn)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(j_loss), t_loss.detach().numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_grad), t_logits.grad.numpy(), rtol=2e-3, atol=2e-5
    )


def test_binary_baseline_shape_parity(rng):
    logits, paths, in_len, tgt_len = _case(rng, binary=True)
    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = noblank_binary_ctc_loss(
        t_logits, torch.tensor(paths), torch.tensor(in_len), torch.tensor(tgt_len)
    )
    t_loss.backward()

    fn = jax.jit(
        lambda lg: losses.no_blank_binary_ctc_loss(
            lg, jnp.asarray(paths), jnp.asarray(in_len), jnp.asarray(tgt_len),
            implementation="xla",
        )
    )
    j_loss, j_grad = jax.value_and_grad(fn)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(j_loss), t_loss.detach().numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_grad), t_logits.grad.numpy(), rtol=2e-3, atol=2e-5
    )


def test_analytic_vjp_matches_autodiff(rng):
    """The custom_vjp backward must equal autodiff through the forward scan."""
    logits, paths, in_len, tgt_len = _case(rng)
    em = gather_log_softmax_emissions(jnp.asarray(logits), jnp.asarray(paths))
    in_len_j, tgt_len_j = jnp.asarray(in_len), jnp.asarray(tgt_len)

    def via_autodiff(e):
        nll, _ = lattice_xla.noblank_lattice_forward(e, in_len_j, tgt_len_j)
        return jnp.sum(nll * jnp.arange(1.0, B + 1))  # non-uniform cotangent

    def via_custom(e):
        nll = lattice_xla.noblank_lattice_nll(e, in_len_j, tgt_len_j)
        return jnp.sum(nll * jnp.arange(1.0, B + 1))

    g_auto = jax.grad(via_autodiff)(em)
    g_custom = jax.grad(via_custom)(em)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), rtol=2e-3, atol=2e-5
    )


@pytest.mark.parametrize(
    "t_len,l_len",
    [(1, 1), (T, 1), (5, 5), (T, L)],
    ids=["T1L1", "L1", "LeqT", "full"],
)
def test_edge_lengths(rng, t_len, l_len):
    """Property tests: L=1, L=T, minimal lattices (SURVEY.md §4 case b)."""
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    paths = rng.integers(0, C, size=(B, L)).astype(np.int32)
    in_len = np.full(B, t_len)
    tgt_len = np.full(B, min(l_len, L))

    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = noblank_ctc_loss(
        t_logits, torch.tensor(paths), torch.tensor(in_len), torch.tensor(tgt_len)
    )
    t_loss.backward()

    j_loss, j_grad = jax.value_and_grad(
        lambda lg: losses.no_blank_ctc_loss(
            lg, jnp.asarray(paths), jnp.asarray(in_len), jnp.asarray(tgt_len),
            implementation="xla",
        )
    )(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(j_loss), t_loss.detach().numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_grad), t_logits.grad.numpy(), rtol=2e-3, atol=2e-5
    )
    assert np.isfinite(np.asarray(j_loss))
    assert np.all(np.isfinite(np.asarray(j_grad)))
