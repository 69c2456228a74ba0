"""Viterbi alignment for the blank-free lattice.

The max-product counterpart of :mod:`ctc_tpu.ops.lattice_xla`'s sum-product
alpha recursion: finds, for a given label path, the most probable monotonic
stay/advance alignment of timesteps to path positions.  (The reference has no
alignment decoder; this completes the lattice toolset.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctc_tpu.ops.logspace import NEG_SENTINEL


def viterbi_align(emissions, input_lengths, target_lengths):
    """Best stay/advance alignment.

    Args:
      emissions: ``[T, B, L]`` per-cell emission log-scores (see
        :mod:`ctc_tpu.ops.emissions`).
      input_lengths / target_lengths: ``[B]`` valid lengths.

    Returns:
      ``(alignment [T, B] int32, score [B])`` — alignment[t, b] is the label
      path position active at time t (garbage past input_lengths[b]).
    """
    max_t, batch, max_l = emissions.shape
    positions = jnp.arange(max_l)[None, :]
    outside = positions >= target_lengths[:, None]

    alpha0 = jnp.full((batch, max_l), NEG_SENTINEL).at[:, 0].set(0.0)

    def fwd(carry, inp):
        alpha_prev, final = carry
        t, em_t = inp
        shifted = jnp.concatenate(
            [jnp.full((batch, 1), NEG_SENTINEL), alpha_prev[:, :-1]], axis=1
        )
        shifted = jnp.where(t > 0, shifted, NEG_SENTINEL)
        take_adv = shifted > alpha_prev  # advance beats stay
        best = jnp.where(take_adv, shifted, alpha_prev)
        best = jnp.where(outside, NEG_SENTINEL, best)
        alpha_t = best + em_t
        gathered = jnp.take_along_axis(
            alpha_t, jnp.clip(target_lengths - 1, 0, max_l - 1)[:, None], 1
        )[:, 0]
        final = jnp.where(t == input_lengths - 1, gathered, final)
        return (alpha_t, final), take_adv

    (_, score), advs = jax.lax.scan(
        fwd, (alpha0, jnp.zeros((batch,))), (jnp.arange(max_t), emissions)
    )  # advs: [T, B, L] bool — whether cell (t, l) came via advance

    # Backtrack from (input_length-1, target_length-1) in reverse scan.
    def back(carry, inp):
        pos = carry  # [B] current path position
        t, adv_t = inp
        active = t <= input_lengths - 1
        start = t == input_lengths - 1
        pos = jnp.where(
            start, jnp.clip(target_lengths - 1, 0, max_l - 1), pos
        )
        out_pos = pos
        step_back = active & (t > 0) & jnp.take_along_axis(
            adv_t, pos[:, None], 1
        )[:, 0]
        pos = jnp.where(step_back, pos - 1, pos)
        return pos, out_pos

    _, alignment = jax.lax.scan(
        back,
        jnp.zeros((batch,), jnp.int32),
        (jnp.arange(max_t), advs.astype(bool)),
        reverse=True,
    )
    return alignment.astype(jnp.int32), score
