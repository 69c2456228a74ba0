"""Pallas TPU kernels for the blank-free CTC lattice.

Replaces the reference's interpreted per-cell python DP
(/root/reference/NoBlankCTC.py:90-126 — ~T*B*L python steps plus an autograd
graph per batch) with two on-chip kernels:

* forward: the alpha recursion as a ``fori_loop`` over T held entirely in
  VMEM — batch rows on sublanes, label-path positions on lanes, the advance
  transition a 1-lane roll.  Emits the full alpha lattice (the residual the
  backward pass needs).
* backward: the reverse occupancy recursion (same lattice, weights read off
  sigmoid(stay - advance) exactly like
  :func:`ctc_tpu.ops.lattice_xla._nll_bwd`), emitting d(nll)/d(emissions).

Layout: ``B`` padded to the 8-row sublane tile, ``L`` padded to the 128-lane
tile, grid over batch tiles.  T stays a static loop bound inside the kernel so
the whole scan is one kernel launch instead of T XLA while-loop iterations.

Wrapped in ``jax.custom_vjp`` with the same signature as the XLA path; the
final-cell gather (``nll = -alpha[T_b-1, b, L_b-1]``) and the
emission->logits chain rule stay in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_tpu.ops.logspace import NEG_SENTINEL

_B_TILE = 8
_LANE = 128
# VMEM budget per kernel: the [T, tile, L] alpha/emission/g blocks are
# double-buffered by the pipeline; keep 4 * block_bytes under ~14MB.
_VMEM_BUDGET = 14 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lane_index(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)


def _forward_kernel(em_ref, outside_ref, alpha_out_ref):
    """alpha recursion for one (8, L) batch tile; T in a fori_loop."""
    max_t = em_ref.shape[0]
    tile = em_ref.shape[1:]  # (8, L)
    outside = outside_ref[:] > 0.5
    lane0 = _lane_index(tile) == 0

    alpha0 = jnp.where(lane0, 0.0, NEG_SENTINEL).astype(em_ref.dtype)

    def body(t, alpha):
        shifted = pltpu.roll(alpha, shift=1, axis=1)
        shifted = jnp.where(lane0, NEG_SENTINEL, shifted)
        # t == 0 has no advance branch; the reference still log-adds the
        # sentinel row there (NoBlankCTC.py:73-78).
        shifted = jnp.where(t > 0, shifted, NEG_SENTINEL)
        lse = jnp.logaddexp(alpha, shifted)
        lse = jnp.where(outside, NEG_SENTINEL, lse)
        alpha = lse + em_ref[t]
        alpha_out_ref[t] = alpha
        return alpha

    jax.lax.fori_loop(0, max_t, body, alpha0)


def _backward_kernel(
    alpha_ref, inject_row_ref, inlen_ref, inside_ref, g_out_ref
):
    """Reverse posterior recursion; emits g = d(nll)/d(emissions)."""
    max_t = alpha_ref.shape[0]
    tile = alpha_ref.shape[1:]
    inside = inside_ref[:] > 0.5
    lane_idx = _lane_index(tile)
    lane0 = lane_idx == 0
    last_lane = lane_idx == (tile[1] - 1)
    inject_row = inject_row_ref[:]
    inlen = inlen_ref[:]

    def body(i, g_next):
        t = max_t - 1 - i
        inject_t = jnp.where(t == inlen - 1, inject_row, 0.0)

        def with_prop():
            alpha_prev = alpha_ref[t]  # alpha at step t == prev for step t+1
            adv = pltpu.roll(alpha_prev, shift=1, axis=1)
            adv = jnp.where(lane0, NEG_SENTINEL, adv)
            # one transcendental: sigmoid(-x) == 1 - sigmoid(x)
            w_stay_raw = jax.nn.sigmoid(alpha_prev - adv)
            w_stay = w_stay_raw * inside
            w_adv = (1.0 - w_stay_raw) * inside
            from_adv = g_next * w_adv
            # left-shift by one lane == roll by L-1 (pltpu.roll needs shift>=0)
            from_adv = jnp.where(
                last_lane, 0.0, pltpu.roll(from_adv, shift=tile[1] - 1, axis=1)
            )
            return g_next * w_stay + from_adv

        prop = jnp.where(t < max_t - 1, with_prop(), 0.0)
        g_t = inject_t + prop
        g_out_ref[t] = g_t
        return g_t

    jax.lax.fori_loop(0, max_t, body, jnp.zeros(tile, alpha_ref.dtype))


def _pad_tbl(x, t, b_pad, l_pad, fill):
    max_t, batch, max_l = x.shape
    return jnp.pad(
        x,
        ((0, 0), (0, b_pad - batch), (0, l_pad - max_l)),
        constant_values=fill,
    )


def _choose_tile(max_t: int, l_pad: int) -> int:
    """Largest batch tile whose double-buffered blocks fit the VMEM budget."""
    for tile in (32, 16, 8):
        if 4 * max_t * tile * l_pad * 4 <= _VMEM_BUDGET:
            return tile
    return _B_TILE


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _forward_padded(em_p, outside_p, *, tile=_B_TILE, interpret=False):
    max_t, b_pad, l_pad = em_p.shape
    grid = (b_pad // tile,)
    return pl.pallas_call(
        _forward_kernel,
        out_shape=jax.ShapeDtypeStruct((max_t, b_pad, l_pad), em_p.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (max_t, tile, l_pad),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, l_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (max_t, tile, l_pad), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(em_p, outside_p)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _backward_padded(alpha_p, inject_row_p, inlen_p, inside_p, *, tile=_B_TILE,
                     interpret=False):
    max_t, b_pad, l_pad = alpha_p.shape
    grid = (b_pad // tile,)
    row_spec = pl.BlockSpec(
        (tile, l_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tbl_spec = pl.BlockSpec(
        (max_t, tile, l_pad), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _backward_kernel,
        out_shape=jax.ShapeDtypeStruct((max_t, b_pad, l_pad), alpha_p.dtype),
        grid=grid,
        in_specs=[tbl_spec, row_spec, row_spec, row_spec],
        out_specs=tbl_spec,
        interpret=interpret,
    )(alpha_p, inject_row_p, inlen_p, inside_p)


def _masks(input_lengths, target_lengths, b_pad, l_pad):
    lane = jnp.arange(l_pad)[None, :]
    tgt = jnp.pad(target_lengths, (0, b_pad - target_lengths.shape[0]),
                  constant_values=1)
    inl = jnp.pad(input_lengths, (0, b_pad - input_lengths.shape[0]),
                  constant_values=1)
    outside = (lane >= tgt[:, None]).astype(jnp.float32)
    return outside, tgt, inl


def _run_forward(emissions, input_lengths, target_lengths, interpret):
    max_t, batch, max_l = emissions.shape
    l_pad = _round_up(max_l, _LANE)
    # interpret mode (CPU tests): smallest tile — padding rows are pure waste
    tile = _B_TILE if interpret else _choose_tile(max_t, l_pad)
    b_pad = _round_up(batch, tile)
    em_p = _pad_tbl(emissions, max_t, b_pad, l_pad, 0.0)
    outside, tgt, inl = _masks(input_lengths, target_lengths, b_pad, l_pad)
    alpha_p = _forward_padded(em_p, outside, tile=tile, interpret=interpret)
    # nll = -alpha[T_b-1, b, L_b-1] — gather in XLA.
    at_l = jnp.take_along_axis(
        alpha_p, jnp.clip(tgt - 1, 0, l_pad - 1)[None, :, None], axis=2
    )[..., 0]  # [T, b_pad]
    final = jnp.take_along_axis(
        at_l, jnp.clip(inl - 1, 0, max_t - 1)[None, :], axis=0
    )[0]  # [b_pad]
    return -final[:batch], alpha_p


def noblank_lattice_nll_pallas(
    emissions, input_lengths, target_lengths, *, interpret=False
):
    """Per-sample NLL ``[B]``; Pallas-accelerated, analytic gradient."""
    return _nll_pallas(emissions, input_lengths, target_lengths, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _nll_pallas(emissions, input_lengths, target_lengths, interpret):
    nll, _ = _run_forward(emissions, input_lengths, target_lengths, interpret)
    return nll


def _nll_pallas_fwd(emissions, input_lengths, target_lengths, interpret):
    nll, alpha_p = _run_forward(
        emissions, input_lengths, target_lengths, interpret
    )
    return nll, (alpha_p, input_lengths, target_lengths, emissions.shape)


def _nll_pallas_bwd(interpret, residuals, nll_bar):
    alpha_p, input_lengths, target_lengths, em_shape = residuals
    max_t, batch, max_l = em_shape
    _, b_pad, l_pad = alpha_p.shape
    lane = jnp.arange(l_pad)[None, :]
    outside, tgt, inl = _masks(input_lengths, target_lengths, b_pad, l_pad)
    inside = 1.0 - outside
    bar = jnp.pad(nll_bar, (0, b_pad - batch))
    inject_row = jnp.where(
        lane == (tgt - 1)[:, None], -bar[:, None], 0.0
    ).astype(alpha_p.dtype)
    inlen_b = jnp.broadcast_to(inl[:, None], (b_pad, l_pad)).astype(jnp.float32)
    tile = _B_TILE if interpret else _choose_tile(max_t, l_pad)
    g_p = _backward_padded(
        alpha_p, inject_row, inlen_b, inside, tile=tile, interpret=interpret
    )
    return (g_p[:, :batch, :max_l], None, None)


_nll_pallas.defvjp(_nll_pallas_fwd, _nll_pallas_bwd)
