"""Blank-free CTC lattice dynamic program as pure-XLA ``lax.scan``.

The lattice is the (T x L) grid of (time step, label-path position) with only
``stay`` (l -> l) and ``advance`` (l-1 -> l) transitions — no blank symbol, so
no skip transition (/root/reference/NoBlankCTC.py:71-87).  In log space:

    alpha[t, l] = em[t, l] + logaddexp(alpha[t-1, l], alpha[t-1, l-1])

with cells at ``l >= target_length`` masked to the finite log-zero sentinel
*before* the emission add, exactly like the reference (its ``outside`` mask at
/root/reference/NoBlankCTC.py:79-81).  The per-sample negative log-likelihood
is ``-alpha[input_length-1, target_length-1]`` — the reference reads this cell
through its ``flip_path_probability`` rotation machinery
(/root/reference/NoBlankCTC.py:126,139); we gather it directly.

Two differentiation paths:

* ``noblank_lattice_nll`` — ``jax.custom_vjp`` with an analytic backward pass
  (occupancy-posterior recursion over the same lattice), fully vectorized over
  (B, L); this is what both the XLA and Pallas-accelerated losses use.
* autodiff through ``noblank_lattice_forward``'s scan — the "reference path"
  used by tests to cross-check the analytic VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctc_tpu.ops.logspace import NEG_SENTINEL


def _outside_mask(target_lengths: jnp.ndarray, max_path_length: int) -> jnp.ndarray:
    """``[B, L]`` bool — True at path positions beyond each sample's length."""
    positions = jnp.arange(max_path_length)[None, :]
    return positions >= target_lengths[:, None]


def make_noblank_step(outside, input_lengths, last_pos):
    """Build the per-timestep scan body of the blank-free alpha DP.

    The step takes ``carry = (alpha_prev [B, L], final [B])`` and
    ``inp = (t_global, em_t [B, L])`` and is shared between the unsharded
    forward below and the sequence-sharded pipeline in
    :mod:`ctc_tpu.parallel.seq_lattice` (which feeds shard-offset global
    timesteps and a boundary-row carry).
    """

    def step(carry, inp):
        alpha_prev, final = carry
        t, em_t = inp
        batch = alpha_prev.shape[0]
        shifted = jnp.concatenate(
            [
                jnp.full((batch, 1), NEG_SENTINEL, alpha_prev.dtype),
                alpha_prev[:, :-1],
            ],
            axis=1,
        )
        # At t == 0 the advance branch is absent; the reference still
        # log-adds the sentinel row (NoBlankCTC.py:73-78), reproduced here.
        advance = jnp.where(t > 0, shifted, NEG_SENTINEL)
        lse = jnp.logaddexp(alpha_prev, advance)
        lse = jnp.where(outside, NEG_SENTINEL, lse)
        alpha_t = lse + em_t
        gathered = jnp.take_along_axis(alpha_t, last_pos, axis=1)[:, 0]
        final = jnp.where(t == input_lengths - 1, gathered, final)
        return (alpha_t, final), alpha_t

    return step


def noblank_lattice_forward(
    emissions: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
):
    """Run the forward (alpha) DP.

    Args:
      emissions: ``[T, B, L]`` per-cell emission log-scores.
      input_lengths: ``[B]`` int, number of valid time steps per sample.
      target_lengths: ``[B]`` int, label-path length per sample.

    Returns:
      ``(nll, alpha)`` where ``nll`` is ``[B]`` per-sample negative
      log-likelihood and ``alpha`` is the full ``[T, B, L]`` lattice (the
      residual needed by the analytic backward pass).
    """
    max_t, batch, max_l = emissions.shape
    outside = _outside_mask(target_lengths, max_l)

    alpha0 = jnp.full((batch, max_l), NEG_SENTINEL, emissions.dtype).at[:, 0].set(0.0)
    final0 = jnp.zeros((batch,), emissions.dtype)
    last_pos = jnp.clip(target_lengths - 1, 0, max_l - 1)[:, None]

    step = make_noblank_step(outside, input_lengths, last_pos)
    (_, final), alpha = jax.lax.scan(
        step, (alpha0, final0), (jnp.arange(max_t), emissions)
    )
    return -final, alpha


@jax.custom_vjp
def noblank_lattice_nll(
    emissions: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Per-sample NLL ``[B]`` of the blank-free lattice, analytic gradient."""
    nll, _ = noblank_lattice_forward(emissions, input_lengths, target_lengths)
    return nll


def _nll_fwd(emissions, input_lengths, target_lengths):
    nll, alpha = noblank_lattice_forward(emissions, input_lengths, target_lengths)
    return nll, (emissions, alpha, input_lengths, target_lengths)


def _nll_bwd(residuals, nll_bar):
    emissions, alpha, input_lengths, target_lengths = residuals
    max_t, batch, max_l = emissions.shape
    dtype = emissions.dtype
    outside = _outside_mask(target_lengths, max_l)  # [B, L]
    inside = jnp.logical_not(outside)

    # alpha_prev[t] = alpha at step t-1 (alpha0 for t = 0).
    alpha0 = jnp.full((batch, max_l), NEG_SENTINEL, dtype).at[:, 0].set(0.0)
    alpha_prev = jnp.concatenate([alpha0[None], alpha[:-1]], axis=0)  # [T, B, L]

    # Branch weights of the two-way logaddexp, computed sigmoid-style from the
    # *difference of the two branch inputs* (exactly like torch's logaddexp
    # backward): w_stay = sigmoid(stay - advance), w_adv = 1 - w_stay.  This
    # matters for gradient parity on degenerate lattices (target_length >
    # input_length): there both branches are *exactly* the -1e13 sentinel in
    # float32, and the weights must be (1/2, 1/2) — reading them off
    # exp(branch - lse) would give (1, 1) because the log(2) is absorbed by
    # the sentinel's huge ulp.  Masked cells have zero dependence on
    # alpha_prev, so their weights are gated to 0.
    adv_input = jnp.concatenate(
        [jnp.full((max_t, batch, 1), NEG_SENTINEL, dtype), alpha_prev[:, :, :-1]],
        axis=2,
    )
    t_pos = (jnp.arange(max_t) > 0)[:, None, None]
    adv_input = jnp.where(t_pos, adv_input, NEG_SENTINEL)
    w_stay_raw = jax.nn.sigmoid(alpha_prev - adv_input)
    w_stay = w_stay_raw * inside[None]
    w_adv = (1.0 - w_stay_raw) * inside[None] * t_pos

    # Cotangent injection: nll = -alpha[T_b - 1, b, L_b - 1].
    t_idx = jnp.arange(max_t)[:, None]  # [T, 1]
    l_idx = jnp.arange(max_l)[None, :]  # [1, L]
    inject = (
        -nll_bar[None, :, None]
        * (t_idx[:, :, None] == (input_lengths - 1)[None, :, None])
        * (l_idx[None] == (target_lengths - 1)[None, :, None])
    ).astype(dtype)  # [T, B, L]

    # Weights used when propagating g from step t+1 down to t.
    zeros_tail = jnp.zeros((1, batch, max_l), dtype)
    ws_next = jnp.concatenate([w_stay[1:], zeros_tail], axis=0)
    wa_next = jnp.concatenate([w_adv[1:], zeros_tail], axis=0)

    def step(g_next, inp):
        inj_t, ws_t, wa_t = inp
        from_adv = g_next * wa_t
        g_t = (
            inj_t
            + g_next * ws_t
            + jnp.concatenate(
                [from_adv[:, 1:], jnp.zeros((batch, 1), dtype)], axis=1
            )
        )
        return g_t, g_t

    _, g = jax.lax.scan(
        step,
        jnp.zeros((batch, max_l), dtype),
        (inject, ws_next, wa_next),
        reverse=True,
    )
    # d nll / d em[t, b, l] == g[t, b, l] (emission enters alpha additively).
    return g, None, None


noblank_lattice_nll.defvjp(_nll_fwd, _nll_bwd)
