"""Pallas TPU kernels for the blank-free CTC lattice.

Replaces the reference's interpreted per-cell python DP
(/root/reference/NoBlankCTC.py:90-126 — ~T*B*L python steps plus an autograd
graph per batch) with two on-chip kernels:

* forward: the alpha recursion as a ``fori_loop`` over a T-chunk held in
  VMEM — batch rows on sublanes, label-path positions on lanes, the advance
  transition a 1-lane roll.  Emits the full alpha lattice (the residual the
  backward pass needs).
* backward: the reverse occupancy recursion (same lattice, weights read off
  sigmoid(stay - advance) exactly like
  :func:`ctc_tpu.ops.lattice_xla._nll_bwd`), emitting d(nll)/d(emissions).

Layout and pipelining: ``B`` padded to a sublane tile, ``L`` padded to the
128-lane tile, and the grid is ``(batch_tiles, time_chunks)`` with the
per-tile alpha (forward) / g (backward) carry living in VMEM scratch across
the sequentially-executed time chunks.  Chunking T keeps each streamed block
small (so the Pallas pipeline overlaps HBM traffic with compute) while
letting the batch tile grow to 64–128 sublane rows, which is what actually
feeds the VPU — the recursion's per-step work is elementwise on a
``(tile, L)`` slab, so wider tiles amortize the scan's serial latency.

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
# batch tiles are independent -> 'parallel' lets Mosaic split them across
# TensorCores on megacore chips; time chunks carry scratch -> 'arbitrary'.
_GRID_SEMANTICS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary")
)
# VMEM budget per kernel: in/out [chunk, tile, L] blocks are double-buffered
# by the pipeline (4 live blocks) plus the (tile, L) carry scratch; keep the
# total under ~14MB (the remote compiler rejects kernels above that).
_VMEM_BUDGET = 14 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lane_index(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)


def _choose_tiles(max_t: int, l_pad: int) -> tuple[int, int]:
    """(batch_tile, t_chunk): widest batch tile whose pipeline fits VMEM.

    Prefers sublane width (more VPU work per scan step) over chunk depth;
    chunk depth only needs to be large enough to keep DMA granularity
    reasonable.  Measured on real TPU: (64, 16) beats the old whole-T
    (16, T) layout ~2x at the bench shape (T=128, L_pad=256).
    """
    for tile in (128, 64, 32, 16, 8):
        for chunk in (32, 16, 8):
            blocks = 4 * chunk * tile * l_pad * 4  # double-buffered in+out
            scratch = tile * l_pad * 4
            rows = 4 * tile * l_pad * 4  # mask/row operands
            if blocks + scratch + rows <= _VMEM_BUDGET:
                return tile, min(chunk, _round_up(max_t, 8))
    return _B_TILE, min(8, _round_up(max_t, 8))


def _widen(x, l_pad):
    """Zero-pad the lane axis of a (tile_b, w) slab up to l_pad (in-VMEM)."""
    w = x.shape[-1]
    if w == l_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, l_pad - w)), constant_values=0.0)


def _forward_kernel(em_ref, outside_ref, alpha_out_ref, carry_ref):
    """alpha recursion for one (chunk, tile, L) block; carry across chunks.

    The emission block's lane width may be unaligned (the raw max_l): it is
    widened to the compute width in VMEM per step, so the caller never pays
    an HBM pad copy.  alpha (the backward residual) stays lane-aligned.
    """
    chunk = em_ref.shape[0]
    tile = alpha_out_ref.shape[1:]  # (tile_b, l_pad) — the compute width
    l_pad = tile[1]
    outside = outside_ref[:] > 0.5
    lane0 = _lane_index(tile) == 0
    pid_t = pl.program_id(1)

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = jnp.where(lane0, 0.0, NEG_SENTINEL).astype(
            carry_ref.dtype
        )

    def body(i, alpha):
        t = pid_t * chunk + i
        shifted = pltpu.roll(alpha, shift=1, axis=1)
        shifted = jnp.where(lane0, NEG_SENTINEL, shifted)
        # t == 0 has no advance branch; the reference still log-adds the
        # sentinel row there (NoBlankCTC.py:73-78).
        shifted = jnp.where(t > 0, shifted, NEG_SENTINEL)
        lse = jnp.logaddexp(alpha, shifted)
        lse = jnp.where(outside, NEG_SENTINEL, lse)
        alpha = lse + _widen(em_ref[i], l_pad)
        alpha_out_ref[i] = alpha
        return alpha

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


def _backward_kernel(
    alpha_ref, inject_row_ref, inlen_ref, inside_ref, g_out_ref, carry_ref
):
    """Reverse posterior recursion; emits g = d(nll)/d(emissions).

    Time chunks are visited in reverse (the index maps flip the t grid
    axis); the g carry persists in scratch across chunks.  The g output
    block's lane width may be unaligned (raw max_l): the carry/compute run
    at the aligned width and each step stores the narrowed slab, so the
    caller never pays an HBM slice copy.
    """
    chunk = alpha_ref.shape[0]
    l_out = g_out_ref.shape[-1]
    tile = alpha_ref.shape[1:]
    n_t = pl.num_programs(1)
    pid_t = pl.program_id(1)
    max_t = n_t * chunk
    t0 = (n_t - 1 - pid_t) * chunk  # global t of this block's first row
    inside = inside_ref[:] > 0.5
    lane_idx = _lane_index(tile)
    lane0 = lane_idx == 0
    last_lane = lane_idx == (tile[1] - 1)
    inject_row = inject_row_ref[:]
    inlen = inlen_ref[:]

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = jnp.zeros(tile, carry_ref.dtype)

    def body(i, g_next):
        ti = chunk - 1 - i
        t = t0 + ti
        inject_t = jnp.where(t == inlen - 1, inject_row, 0.0)

        def with_prop():
            alpha_prev = alpha_ref[ti]  # alpha at step t == prev for t+1
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
        g_out_ref[ti] = g_t[:, :l_out]
        return g_t

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


def _pad_tbl(x, t_pad, b_pad, l_pad, fill):
    max_t, batch, max_l = x.shape
    return jnp.pad(
        x,
        ((0, t_pad - max_t), (0, b_pad - batch), (0, l_pad - max_l)),
        constant_values=fill,
    )


@functools.partial(jax.jit, static_argnames=("tile", "chunk", "interpret"))
def _forward_padded(em_p, outside_p, *, tile, chunk, interpret=False):
    """em_p is [t_pad, b_pad, max_l] — lane axis may be unaligned; alpha out
    is lane-aligned at outside_p's width."""
    t_pad, b_pad, max_l = em_p.shape
    l_pad = outside_p.shape[-1]
    grid = (b_pad // tile, t_pad // chunk)
    em_spec = pl.BlockSpec(
        (chunk, tile, max_l), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    tbl_spec = pl.BlockSpec(
        (chunk, tile, l_pad), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (tile, l_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _forward_kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, l_pad), em_p.dtype),
        grid=grid,
        in_specs=[em_spec, row_spec],
        out_specs=tbl_spec,
        scratch_shapes=[pltpu.VMEM((tile, l_pad), em_p.dtype)],
        compiler_params=None if interpret else _GRID_SEMANTICS,
        interpret=interpret,
    )(em_p, outside_p)


@functools.partial(
    jax.jit, static_argnames=("max_l", "tile", "chunk", "interpret")
)
def _backward_padded(alpha_p, inject_row_p, inlen_p, inside_p, *, max_l, tile,
                     chunk, interpret=False):
    """alpha_p is lane-aligned; the g output is [t_pad, b_pad, max_l] with a
    possibly-unaligned lane axis (stored narrowed in-kernel)."""
    t_pad, b_pad, l_pad = alpha_p.shape
    n_t = t_pad // chunk
    grid = (b_pad // tile, n_t)
    # time chunks visited last-to-first: flip the t grid axis in the maps
    rev_tbl_spec = pl.BlockSpec(
        (chunk, tile, l_pad),
        lambda i, j: (n_t - 1 - j, i, 0),
        memory_space=pltpu.VMEM,
    )
    rev_out_spec = pl.BlockSpec(
        (chunk, tile, max_l),
        lambda i, j: (n_t - 1 - j, i, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (tile, l_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _backward_kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, max_l), alpha_p.dtype),
        grid=grid,
        in_specs=[rev_tbl_spec, row_spec, row_spec, row_spec],
        out_specs=rev_out_spec,
        scratch_shapes=[pltpu.VMEM((tile, l_pad), alpha_p.dtype)],
        compiler_params=None if interpret else _GRID_SEMANTICS,
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


def _tiles_for(max_t, l_pad, interpret, override):
    if override is not None:
        return override
    if interpret:
        # interpret mode (CPU tests): smallest tile, single chunk — padding
        # rows and extra grid steps are pure interpreted-python waste.
        return _B_TILE, _round_up(max_t, 8)
    return _choose_tiles(max_t, l_pad)


def _run_forward(emissions, input_lengths, target_lengths, interpret,
                 tiles=None):
    max_t, batch, max_l = emissions.shape
    l_pad = _round_up(max_l, _LANE)
    tile, chunk = _tiles_for(max_t, l_pad, interpret, tiles)
    t_pad = _round_up(max_t, chunk)
    b_pad = _round_up(batch, tile)
    # L stays unpadded — the kernel widens lanes in VMEM (no HBM pad copy);
    # T/B pads are no-ops when already aligned.
    em_p = _pad_tbl(emissions, t_pad, b_pad, max_l, 0.0)
    outside, tgt, inl = _masks(input_lengths, target_lengths, b_pad, l_pad)
    alpha_p = _forward_padded(
        em_p, outside, tile=tile, chunk=chunk, interpret=interpret
    )
    # nll = -alpha[T_b-1, b, L_b-1] — gather in XLA.
    at_l = jnp.take_along_axis(
        alpha_p, jnp.clip(tgt - 1, 0, l_pad - 1)[None, :, None], axis=2
    )[..., 0]  # [T_pad, b_pad]
    final = jnp.take_along_axis(
        at_l, jnp.clip(inl - 1, 0, max_t - 1)[None, :], axis=0
    )[0]  # [b_pad]
    return -final[:batch], alpha_p


def noblank_lattice_nll_pallas(
    emissions, input_lengths, target_lengths, *, interpret=False, tiles=None
):
    """Per-sample NLL ``[B]``; Pallas-accelerated, analytic gradient.

    ``tiles=(batch_tile, t_chunk)`` overrides the auto layout (probing/tests).
    """
    return _nll_pallas(
        emissions, input_lengths, target_lengths, interpret, tiles
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _nll_pallas(emissions, input_lengths, target_lengths, interpret, tiles):
    nll, _ = _run_forward(
        emissions, input_lengths, target_lengths, interpret, tiles
    )
    return nll


def _nll_pallas_fwd(emissions, input_lengths, target_lengths, interpret,
                    tiles):
    nll, alpha_p = _run_forward(
        emissions, input_lengths, target_lengths, interpret, tiles
    )
    return nll, (alpha_p, input_lengths, target_lengths, emissions.shape)


def _nll_pallas_bwd(interpret, tiles, residuals, nll_bar):
    alpha_p, input_lengths, target_lengths, em_shape = residuals
    max_t, batch, max_l = em_shape
    t_pad, b_pad, l_pad = alpha_p.shape
    lane = jnp.arange(l_pad)[None, :]
    outside, tgt, inl = _masks(input_lengths, target_lengths, b_pad, l_pad)
    inside = 1.0 - outside
    bar = jnp.pad(nll_bar, (0, b_pad - batch))
    inject_row = jnp.where(
        lane == (tgt - 1)[:, None], -bar[:, None], 0.0
    ).astype(alpha_p.dtype)
    inlen_b = jnp.broadcast_to(inl[:, None], (b_pad, l_pad)).astype(jnp.float32)
    tile, chunk = _tiles_for(max_t, l_pad, interpret, tiles)
    g_p = _backward_padded(
        alpha_p, inject_row, inlen_b, inside, max_l=max_l, tile=tile,
        chunk=chunk, interpret=interpret,
    )
    # lane axis already narrow; T/B slices are no-ops when aligned
    return (g_p[:max_t, :batch], None, None)


_nll_pallas.defvjp(_nll_pallas_fwd, _nll_pallas_bwd)
