"""Pallas TPU kernels for the *blank* CTC lattice (stay/advance/skip).

The standard-CTC capability of the reference (torch.nn.CTCLoss at
/root/reference/models/layers/AsyncTFCriterion.py:198 and
/root/reference/test.py:514) accelerated the same way as the blank-free
lattice in :mod:`ctc_tpu.ops.lattice_pallas`: the alpha recursion runs as a
``fori_loop`` over a time chunk held in VMEM, and the backward pass is the
analytic reverse occupancy recursion emitting d(nll)/d(emissions).

Differences from the no-blank kernel:

* the lattice runs over the blank-expanded sequence ``z = [b, l1, b, ..., b]``
  of width ``S = 2L+1``; emissions ``em[t, b, s] = log_probs[t, b, z[b, s]]``
  are built in XLA — a one-hot MXU einsum in the kernel's native 'tlb'
  layout, a gather for 'tbl' (see losses/blank.py) — so the
  emission->logits chain rule stays in XLA autodiff and only the O(T*S)
  DP is hand-differentiated.
* a third *skip* transition ``alpha[t-1, s-2]`` gated by a per-(b, s) mask
  (``s`` odd, label differs from the one two slots back) — passed in as a
  slab operand like the no-blank kernel's ``outside`` mask.
* branch weights in the backward pass are a 3-way softmax
  ``w_i = exp(a_i - logsumexp(a))`` instead of the 2-way sigmoid trick.
* no validity masking is needed inside the kernel: transitions only move
  from lower to higher ``s``, so cells beyond a sample's ``2*L_b+1`` never
  feed the cells the loss reads, and the backward injection seeds only
  valid cells (gradients stay exactly zero elsewhere because
  ``exp(SENTINEL - finite)`` underflows to 0).

Layouts, grid, tiling, VMEM budget, and the ``custom_vjp`` structure are
shared with (imported from) :mod:`ctc_tpu.ops.lattice_pallas`.

The loss reads ``nll = -logaddexp(alpha[T_b-1, 2L_b], alpha[T_b-1, 2L_b-1])``
(blank-or-label final cell, torch.nn.CTCLoss semantics); the backward pass
injects ``-cotangent * softmax(final cells)`` at those two positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_tpu.ops.lattice_pallas import (
    _GRID_SEMANTICS,
    _LANE,
    _SUBLANE,
    _label_index,
    _narrow,
    _orient_row,
    _pad_tb,
    _round_up,
    _tiles_for,
    _widen,
)
from ctc_tpu.ops.logspace import BLANK_NEG


def _forward_kernel(em_ref, skip_ref, alpha_out_ref, carry_ref, *, label_axis):
    """Blank-CTC alpha recursion for one (chunk, slab) block.

    Same carry-in-scratch chunking as the no-blank forward kernel; the only
    new operand is the skip-permission slab.
    """
    chunk = em_ref.shape[0]
    slab = alpha_out_ref.shape[1:]
    l_pad = slab[label_axis]
    skip_ok = skip_ref[:] > 0.5
    lab0 = _label_index(slab, label_axis) == 0
    pid_t = pl.program_id(1)

    @pl.when(pid_t == 0)
    def _init():
        # alpha(-1, s) := 0 at s == 0 so that t == 0 yields em at s in {0, 1}
        # (stay from s=0, advance into s=1) — the torch CTC initialization.
        carry_ref[:] = jnp.where(lab0, 0.0, BLANK_NEG).astype(carry_ref.dtype)

    def body(i, alpha):
        t = pid_t * chunk + i
        adv = pltpu.roll(alpha, shift=1, axis=label_axis)
        adv = jnp.where(lab0, BLANK_NEG, adv)
        skp = pltpu.roll(alpha, shift=2, axis=label_axis)
        # skip is illegal at t == 0 (it would alias the s == 0 init cell).
        skp = jnp.where(jnp.logical_and(skip_ok, t > 0), skp, BLANK_NEG)
        lse = jnp.logaddexp(jnp.logaddexp(alpha, adv), skp)
        alpha = lse + _widen(em_ref[i], l_pad, label_axis)
        alpha_out_ref[i] = alpha
        return alpha

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


def _backward_kernel(
    alpha_ref, skip_ref, inject_row_ref, inlen_ref, g_out_ref, carry_ref,
    *, label_axis
):
    """Reverse posterior recursion with 3-way branch weights.

    ``g(t, s) = inject(t, s) + Σ_branch g(t+1, s') * w_branch(t+1, s')`` where
    the branch weights are the softmax of the stay/advance/skip scores read
    off the stored alpha at step t.  Time chunks are visited in reverse; the
    g carry persists in VMEM scratch across chunks.
    """
    chunk = alpha_ref.shape[0]
    slab = alpha_ref.shape[1:]
    l_pad = slab[label_axis]
    l_out = g_out_ref.shape[1 + label_axis]
    n_t = pl.num_programs(1)
    pid_t = pl.program_id(1)
    max_t = n_t * chunk
    t0 = (n_t - 1 - pid_t) * chunk
    skip_ok = skip_ref[:] > 0.5
    lab_idx = _label_index(slab, label_axis)
    lab0 = lab_idx == 0
    inject_row = inject_row_ref[:]
    inlen = inlen_ref[:]

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = jnp.zeros(slab, carry_ref.dtype)

    def body(i, g_next):
        ti = chunk - 1 - i
        t = t0 + ti
        inject_t = jnp.where(t == inlen - 1, inject_row, 0.0)

        def with_prop():
            alpha_prev = alpha_ref[ti]  # alpha at t == source for step t+1
            a_stay = alpha_prev
            a_adv = pltpu.roll(alpha_prev, shift=1, axis=label_axis)
            a_adv = jnp.where(lab0, BLANK_NEG, a_adv)
            a_skip = pltpu.roll(alpha_prev, shift=2, axis=label_axis)
            a_skip = jnp.where(skip_ok, a_skip, BLANK_NEG)
            lse = jnp.logaddexp(jnp.logaddexp(a_stay, a_adv), a_skip)
            w_stay = jnp.exp(a_stay - lse)
            w_adv = jnp.exp(a_adv - lse)
            w_skip = jnp.exp(a_skip - lse)
            from_adv = jnp.where(
                lab_idx >= l_pad - 1,
                0.0,
                pltpu.roll(g_next * w_adv, shift=l_pad - 1, axis=label_axis),
            )
            from_skip = jnp.where(
                lab_idx >= l_pad - 2,
                0.0,
                pltpu.roll(g_next * w_skip, shift=l_pad - 2, axis=label_axis),
            )
            return g_next * w_stay + from_adv + from_skip

        prop = jnp.where(t < max_t - 1, with_prop(), 0.0)
        g_t = inject_t + prop
        g_out_ref[ti] = _narrow(g_t, l_out, label_axis)
        return g_t

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


def _forward_kernel_boundary(em_ref, skip_ref, init0_ref, skip0_ref,
                             alpha_out_ref, carry_ref, *, label_axis):
    """Boundary-aware blank forward (the seq-pipeline shard kernel).

    ``init0`` seeds the alpha carry (the virtual ``alpha(-1)`` row on
    shard 0, the incoming boundary row on interior shards); ``skip0`` is
    the skip-branch SOURCE for the first local step only (all-sentinel on
    shard 0 — encoding the t == 0 skip gate without a scalar t-offset —
    and the boundary row on interior shards)."""
    chunk = em_ref.shape[0]
    slab = alpha_out_ref.shape[1:]
    l_pad = slab[label_axis]
    skip_ok = skip_ref[:] > 0.5
    lab0 = _label_index(slab, label_axis) == 0
    pid_t = pl.program_id(1)
    skip0 = skip0_ref[:]

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = init0_ref[:]

    def body(i, alpha):
        t = pid_t * chunk + i
        adv = pltpu.roll(alpha, shift=1, axis=label_axis)
        adv = jnp.where(lab0, BLANK_NEG, adv)
        src = jnp.where(t == 0, skip0, alpha)
        skp = pltpu.roll(src, shift=2, axis=label_axis)
        skp = jnp.where(skip_ok, skp, BLANK_NEG)
        lse = jnp.logaddexp(jnp.logaddexp(alpha, adv), skp)
        alpha = lse + _widen(em_ref[i], l_pad, label_axis)
        alpha_out_ref[i] = alpha
        return alpha

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


def _backward_kernel_boundary(
    alpha_ref, skip_ref, inject_row_ref, inlen_ref, g_seed_ref, g_out_ref,
    carry_ref, *, label_axis, t_last
):
    """Boundary-aware blank backward: ``g_seed`` (the outgoing boundary
    row's cotangent) lands on the static last real row ``t_last``; ``inlen``
    is shard-local so non-owning shards never take the final-cell inject."""
    chunk = alpha_ref.shape[0]
    slab = alpha_ref.shape[1:]
    l_pad = slab[label_axis]
    l_out = g_out_ref.shape[1 + label_axis]
    n_t = pl.num_programs(1)
    pid_t = pl.program_id(1)
    t0 = (n_t - 1 - pid_t) * chunk
    skip_ok = skip_ref[:] > 0.5
    lab_idx = _label_index(slab, label_axis)
    lab0 = lab_idx == 0
    inject_row = inject_row_ref[:]
    g_seed = g_seed_ref[:]
    inlen = inlen_ref[:]

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = jnp.zeros(slab, carry_ref.dtype)

    def body(i, g_next):
        ti = chunk - 1 - i
        t = t0 + ti
        inject_t = jnp.where(t == inlen - 1, inject_row, 0.0)

        def with_prop():
            alpha_prev = alpha_ref[ti]
            a_stay = alpha_prev
            a_adv = pltpu.roll(alpha_prev, shift=1, axis=label_axis)
            a_adv = jnp.where(lab0, BLANK_NEG, a_adv)
            a_skip = pltpu.roll(alpha_prev, shift=2, axis=label_axis)
            a_skip = jnp.where(skip_ok, a_skip, BLANK_NEG)
            lse = jnp.logaddexp(jnp.logaddexp(a_stay, a_adv), a_skip)
            w_stay = jnp.exp(a_stay - lse)
            w_adv = jnp.exp(a_adv - lse)
            w_skip = jnp.exp(a_skip - lse)
            from_adv = jnp.where(
                lab_idx >= l_pad - 1,
                0.0,
                pltpu.roll(g_next * w_adv, shift=l_pad - 1, axis=label_axis),
            )
            from_skip = jnp.where(
                lab_idx >= l_pad - 2,
                0.0,
                pltpu.roll(g_next * w_skip, shift=l_pad - 2, axis=label_axis),
            )
            return g_next * w_stay + from_adv + from_skip

        prop = jnp.where(t < t_last, with_prop(), 0.0)
        g_t = inject_t + jnp.where(t == t_last, g_seed, 0.0) + prop
        g_out_ref[ti] = _narrow(g_t, l_out, label_axis)
        return g_t

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "label_axis", "interpret")
)
def _forward_padded(em_p, skip_p, *, tile, chunk, label_axis, interpret=False):
    t_pad = em_p.shape[0]
    max_s = em_p.shape[1 + label_axis]
    l_pad = skip_p.shape[label_axis]
    b_pad = em_p.shape[2 - label_axis]
    grid = (b_pad // tile, t_pad // chunk)
    if label_axis == 0:
        blk = lambda l_dim: (chunk, l_dim, tile)
        tbl_map = lambda i, j: (j, 0, i)
        row_map = lambda i, j: (0, i)
        out_shape = (t_pad, l_pad, b_pad)
    else:
        blk = lambda l_dim: (chunk, tile, l_dim)
        tbl_map = lambda i, j: (j, i, 0)
        row_map = lambda i, j: (i, 0)
        out_shape = (t_pad, b_pad, l_pad)
    em_spec = pl.BlockSpec(blk(max_s), tbl_map, memory_space=pltpu.VMEM)
    alpha_spec = pl.BlockSpec(blk(l_pad), tbl_map, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(blk(l_pad)[1:], row_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_forward_kernel, label_axis=label_axis),
        out_shape=jax.ShapeDtypeStruct(out_shape, em_p.dtype),
        grid=grid,
        in_specs=[em_spec, row_spec],
        out_specs=alpha_spec,
        scratch_shapes=[pltpu.VMEM(blk(l_pad)[1:], em_p.dtype)],
        compiler_params=None if interpret else _GRID_SEMANTICS,
        interpret=interpret,
    )(em_p, skip_p)


@functools.partial(
    jax.jit,
    static_argnames=("max_s", "tile", "chunk", "label_axis", "interpret"),
)
def _backward_padded(alpha_p, skip_p, inject_row_p, inlen_p, *, max_s, tile,
                     chunk, label_axis, interpret=False):
    t_pad = alpha_p.shape[0]
    l_pad = alpha_p.shape[1 + label_axis]
    b_pad = alpha_p.shape[2 - label_axis]
    n_t = t_pad // chunk
    grid = (b_pad // tile, n_t)
    if label_axis == 0:
        blk = lambda l_dim: (chunk, l_dim, tile)
        rev_map = lambda i, j: (n_t - 1 - j, 0, i)
        row_map = lambda i, j: (0, i)
        g_shape = (t_pad, max_s, b_pad)
    else:
        blk = lambda l_dim: (chunk, tile, l_dim)
        rev_map = lambda i, j: (n_t - 1 - j, i, 0)
        row_map = lambda i, j: (i, 0)
        g_shape = (t_pad, b_pad, max_s)
    alpha_spec = pl.BlockSpec(blk(l_pad), rev_map, memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec(blk(max_s), rev_map, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(blk(l_pad)[1:], row_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_backward_kernel, label_axis=label_axis),
        out_shape=jax.ShapeDtypeStruct(g_shape, alpha_p.dtype),
        grid=grid,
        in_specs=[alpha_spec, row_spec, row_spec, row_spec],
        out_specs=g_spec,
        scratch_shapes=[pltpu.VMEM(blk(l_pad)[1:], alpha_p.dtype)],
        compiler_params=None if interpret else _GRID_SEMANTICS,
        interpret=interpret,
    )(alpha_p, skip_p, inject_row_p, inlen_p)


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "label_axis", "interpret")
)
def _forward_boundary_padded(em_p, skip_p, init0_p, skip0_p, *, tile, chunk,
                             label_axis, interpret=False):
    t_pad = em_p.shape[0]
    max_s = em_p.shape[1 + label_axis]
    l_pad = skip_p.shape[label_axis]
    b_pad = em_p.shape[2 - label_axis]
    grid = (b_pad // tile, t_pad // chunk)
    if label_axis == 0:
        blk = lambda l_dim: (chunk, l_dim, tile)
        tbl_map = lambda i, j: (j, 0, i)
        row_map = lambda i, j: (0, i)
        out_shape = (t_pad, l_pad, b_pad)
    else:
        blk = lambda l_dim: (chunk, tile, l_dim)
        tbl_map = lambda i, j: (j, i, 0)
        row_map = lambda i, j: (i, 0)
        out_shape = (t_pad, b_pad, l_pad)
    em_spec = pl.BlockSpec(blk(max_s), tbl_map, memory_space=pltpu.VMEM)
    alpha_spec = pl.BlockSpec(blk(l_pad), tbl_map, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(blk(l_pad)[1:], row_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_forward_kernel_boundary, label_axis=label_axis),
        out_shape=jax.ShapeDtypeStruct(out_shape, em_p.dtype),
        grid=grid,
        in_specs=[em_spec, row_spec, row_spec, row_spec],
        out_specs=alpha_spec,
        scratch_shapes=[pltpu.VMEM(blk(l_pad)[1:], em_p.dtype)],
        compiler_params=None if interpret else _GRID_SEMANTICS,
        interpret=interpret,
    )(em_p, skip_p, init0_p, skip0_p)


@functools.partial(
    jax.jit,
    static_argnames=("max_s", "tile", "chunk", "label_axis", "t_last",
                     "interpret"),
)
def _backward_boundary_padded(alpha_p, skip_p, inject_row_p, inlen_p,
                              g_seed_p, *, max_s, tile, chunk, label_axis,
                              t_last, interpret=False):
    t_pad = alpha_p.shape[0]
    l_pad = alpha_p.shape[1 + label_axis]
    b_pad = alpha_p.shape[2 - label_axis]
    n_t = t_pad // chunk
    grid = (b_pad // tile, n_t)
    if label_axis == 0:
        blk = lambda l_dim: (chunk, l_dim, tile)
        rev_map = lambda i, j: (n_t - 1 - j, 0, i)
        row_map = lambda i, j: (0, i)
        g_shape = (t_pad, max_s, b_pad)
    else:
        blk = lambda l_dim: (chunk, tile, l_dim)
        rev_map = lambda i, j: (n_t - 1 - j, i, 0)
        row_map = lambda i, j: (i, 0)
        g_shape = (t_pad, b_pad, max_s)
    alpha_spec = pl.BlockSpec(blk(l_pad), rev_map, memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec(blk(max_s), rev_map, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(blk(l_pad)[1:], row_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_backward_kernel_boundary, label_axis=label_axis,
                          t_last=t_last),
        out_shape=jax.ShapeDtypeStruct(g_shape, alpha_p.dtype),
        grid=grid,
        in_specs=[alpha_spec, row_spec, row_spec, row_spec, row_spec],
        out_specs=g_spec,
        scratch_shapes=[pltpu.VMEM(blk(l_pad)[1:], alpha_p.dtype)],
        compiler_params=None if interpret else _GRID_SEMANTICS,
        interpret=interpret,
    )(alpha_p, skip_p, inject_row_p, inlen_p, g_seed_p)


def _pads(skip_ok, input_lengths, target_lengths, b_pad, l_pad, label_axis):
    """Pad/orient the per-batch operands into kernel-orientation slabs."""
    batch, max_s = skip_ok.shape
    skip = jnp.pad(
        skip_ok.astype(jnp.float32),
        ((0, b_pad - batch), (0, l_pad - max_s)),
    )  # [b_pad, l_pad]
    tgt = jnp.pad(target_lengths, (0, b_pad - batch))
    inl = jnp.pad(input_lengths, (0, b_pad - batch), constant_values=1)
    if label_axis == 0:
        skip = skip.T
    return skip, tgt, inl


def _final_cells(alpha_p, tgt, inl, max_t, label_axis):
    """Gather alpha at the two torch-CTC final cells -> (aA, aB) each [b_pad].

    aA is the trailing-blank cell ``s = 2*L_b`` (also the ``L_b == 0`` cell),
    aB the last-label cell ``s = 2*L_b - 1``.
    """
    l_pad = alpha_p.shape[1 + label_axis]
    s_a = jnp.clip(2 * tgt, 0, l_pad - 1)
    s_b = jnp.clip(2 * tgt - 1, 0, l_pad - 1)
    if label_axis == 0:
        pick = lambda idx: jnp.take_along_axis(
            alpha_p, idx[None, None, :], axis=1
        )[:, 0, :]
    else:
        pick = lambda idx: jnp.take_along_axis(
            alpha_p, idx[None, :, None], axis=2
        )[..., 0]
    t_idx = jnp.clip(inl - 1, 0, max_t - 1)[None, :]
    a_a = jnp.take_along_axis(pick(s_a), t_idx, axis=0)[0]
    a_b = jnp.take_along_axis(pick(s_b), t_idx, axis=0)[0]
    return a_a, a_b


def _run_forward(emissions, skip_ok, input_lengths, target_lengths, layout,
                 interpret, tiles=None):
    label_axis = 0 if layout == "tlb" else 1
    max_t = emissions.shape[0]
    max_s = emissions.shape[1 + label_axis]
    batch = emissions.shape[2 - label_axis]
    l_pad = _round_up(max_s, _SUBLANE if layout == "tlb" else _LANE)
    tile, chunk = _tiles_for(max_t, max_s, layout, interpret, tiles, batch)
    t_pad = _round_up(max_t, chunk)
    b_pad = _round_up(batch, tile)
    em_p = _pad_tb(emissions, t_pad, b_pad, label_axis, 0.0)
    skip_p, tgt, inl = _pads(
        skip_ok, input_lengths, target_lengths, b_pad, l_pad, label_axis
    )
    alpha_p = _forward_padded(
        em_p, skip_p, tile=tile, chunk=chunk, label_axis=label_axis,
        interpret=interpret,
    )
    a_a, a_b = _final_cells(alpha_p, tgt, inl, max_t, label_axis)
    final = jnp.where(tgt > 0, jnp.logaddexp(a_a, a_b), a_a)
    return -final[:batch], alpha_p


def blank_lattice_nll_pallas(
    emissions, skip_ok, input_lengths, target_lengths, *, layout="tbl",
    interpret=False, tiles=None
):
    """Per-sample blank-CTC NLL ``[B]``; Pallas-accelerated, analytic grad.

    Args:
      emissions: gathered log-probs over the blank-expanded sequence —
        ``[T, B, S]`` for ``layout='tbl'`` or ``[T, S, B]`` for ``'tlb'``
        (S = 2L+1; label slots on sublanes — the faster layout at large S).
      skip_ok: ``[B, S]`` bool — skip transition permitted into slot s.
      input_lengths / target_lengths: ``[B]`` valid lengths (targets in
        labels, not slots).
      tiles: ``(batch_tile, t_chunk)`` override for probing/tests.
    """
    return _nll_pallas(
        emissions, skip_ok, input_lengths, target_lengths, layout, interpret,
        tiles,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _nll_pallas(emissions, skip_ok, input_lengths, target_lengths, layout,
                interpret, tiles):
    nll, _ = _run_forward(
        emissions, skip_ok, input_lengths, target_lengths, layout, interpret,
        tiles,
    )
    return nll


def _nll_pallas_fwd(emissions, skip_ok, input_lengths, target_lengths, layout,
                    interpret, tiles):
    nll, alpha_p = _run_forward(
        emissions, skip_ok, input_lengths, target_lengths, layout, interpret,
        tiles,
    )
    res = (alpha_p, skip_ok, input_lengths, target_lengths, emissions.shape)
    return nll, res


def _nll_pallas_bwd(layout, interpret, tiles, residuals, nll_bar):
    alpha_p, skip_ok, input_lengths, target_lengths, em_shape = residuals
    label_axis = 0 if layout == "tlb" else 1
    max_t = em_shape[0]
    max_s = em_shape[1 + label_axis]
    batch = em_shape[2 - label_axis]
    l_pad = alpha_p.shape[1 + label_axis]
    b_pad = alpha_p.shape[2 - label_axis]
    skip_p, tgt, inl = _pads(
        skip_ok, input_lengths, target_lengths, b_pad, l_pad, label_axis
    )
    bar = jnp.pad(nll_bar, (0, b_pad - batch))
    # Injection: d(nll)/d(alpha[T_b-1, s]) = -softmax over the two final
    # cells (only the trailing-blank cell when L_b == 0).
    a_a, a_b = _final_cells(alpha_p, tgt, inl, max_t, label_axis)
    lse_f = jnp.where(tgt > 0, jnp.logaddexp(a_a, a_b), a_a)
    w_a = jnp.exp(a_a - lse_f)
    w_b = jnp.where(tgt > 0, jnp.exp(a_b - lse_f), 0.0)
    s_a = jnp.clip(2 * tgt, 0, l_pad - 1)
    s_b = jnp.clip(2 * tgt - 1, 0, l_pad - 1)
    pos = jnp.arange(l_pad)
    if label_axis == 0:
        inject = (
            jnp.where(pos[:, None] == s_a[None, :], (-bar * w_a)[None, :], 0.0)
            + jnp.where(
                jnp.logical_and(pos[:, None] == s_b[None, :], tgt[None, :] > 0),
                (-bar * w_b)[None, :],
                0.0,
            )
        ).astype(alpha_p.dtype)
        inlen_b = jnp.broadcast_to(inl[None, :], (l_pad, b_pad)).astype(
            jnp.float32
        )
    else:
        inject = (
            jnp.where(pos[None, :] == s_a[:, None], (-bar * w_a)[:, None], 0.0)
            + jnp.where(
                jnp.logical_and(pos[None, :] == s_b[:, None], tgt[:, None] > 0),
                (-bar * w_b)[:, None],
                0.0,
            )
        ).astype(alpha_p.dtype)
        inlen_b = jnp.broadcast_to(inl[:, None], (b_pad, l_pad)).astype(
            jnp.float32
        )
    tile, chunk = _tiles_for(max_t, max_s, layout, interpret, tiles, batch)
    g_p = _backward_padded(
        alpha_p, skip_p, inject, inlen_b, max_s=max_s, tile=tile, chunk=chunk,
        label_axis=label_axis, interpret=interpret,
    )
    g = g_p[:max_t]
    g = g[:, :, :batch] if label_axis == 0 else g[:, :batch]
    return (g, None, None, None)


_nll_pallas.defvjp(_nll_pallas_fwd, _nll_pallas_bwd)


# ---------------------------------------------------------------------------
# Boundary-aware shard op for the sequence-sharded pipeline (the blank-CTC
# twin of ctc_tpu.ops.lattice_pallas.noblank_shard_lattice_pallas).
# ---------------------------------------------------------------------------


def _run_shard_forward(em, init0, skip0, skip_ok, inlen_local,
                       target_lengths, layout, interpret, tiles):
    label_axis = 0 if layout == "tlb" else 1
    max_t = em.shape[0]
    max_s = em.shape[1 + label_axis]
    batch = em.shape[2 - label_axis]
    l_pad = _round_up(max_s, _SUBLANE if layout == "tlb" else _LANE)
    tile, chunk = _tiles_for(max_t, max_s, layout, interpret, tiles, batch)
    t_pad = _round_up(max_t, chunk)
    b_pad = _round_up(batch, tile)
    em_p = _pad_tb(em, t_pad, b_pad, label_axis, 0.0)
    skip_p, tgt, _ = _pads(
        skip_ok, inlen_local, target_lengths, b_pad, l_pad, label_axis
    )
    row_pad = ((0, b_pad - batch), (0, l_pad - init0.shape[1]))
    init0_p = _orient_row(
        jnp.pad(init0, row_pad, constant_values=BLANK_NEG), label_axis
    )
    skip0_p = _orient_row(
        jnp.pad(skip0, row_pad, constant_values=BLANK_NEG), label_axis
    )
    alpha_p = _forward_boundary_padded(
        em_p, skip_p, init0_p, skip0_p, tile=tile, chunk=chunk,
        label_axis=label_axis, interpret=interpret,
    )
    inl = jnp.pad(inlen_local, (0, b_pad - batch), constant_values=0)
    a_a, a_b = _final_cells(alpha_p, tgt, inl, max_t, label_axis)
    own = (inl >= 1) & (inl <= max_t)
    final = jnp.where(
        own, jnp.where(tgt > 0, jnp.logaddexp(a_a, a_b), a_a), 0.0
    )[:batch]
    brow = alpha_p[max_t - 1]
    boundary = (brow.T if label_axis == 0 else brow)[:batch]
    return final, boundary, alpha_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def blank_shard_lattice_pallas(em, init0, skip0, skip_ok, inlen_local,
                               target_lengths, layout="tlb", interpret=False,
                               tiles=None):
    """One sequence-shard of the blank-CTC lattice as a Pallas-kernel op.

    Args:
      em: shard emissions over the blank-expanded sequence — ``[t_s, S, B]``
        (``'tlb'``) or ``[t_s, B, S]`` (``'tbl'``).
      init0: ``[B, W]`` alpha carry seed (virtual ``alpha(-1)`` on shard 0,
        the incoming boundary on interior shards).
      skip0: ``[B, W]`` skip source for the first local step (all-sentinel
      	on shard 0 = the t==0 skip gate; the boundary row on interior
        shards).
      skip_ok: ``[B, S]`` skip-permission mask.
      inlen_local: ``[B]`` shard-local input lengths.
      target_lengths: ``[B]`` (labels, not slots).

    Returns ``(final [B], boundary_out [B, W])``; differentiable in
    ``em``/``init0``/``skip0``.
    """
    final, boundary, _ = _run_shard_forward(
        em, init0, skip0, skip_ok, inlen_local, target_lengths, layout,
        interpret, tiles,
    )
    return final, boundary


def _shard_fwd(em, init0, skip0, skip_ok, inlen_local, target_lengths,
               layout, interpret, tiles):
    final, boundary, alpha_p = _run_shard_forward(
        em, init0, skip0, skip_ok, inlen_local, target_lengths, layout,
        interpret, tiles,
    )
    return (final, boundary), (
        alpha_p, init0, skip0, skip_ok, inlen_local, target_lengths, em.shape
    )


def _shard_bwd(layout, interpret, tiles, residuals, cotangents):
    (alpha_p, init0, skip0, skip_ok, inlen_local, target_lengths,
     em_shape) = residuals
    d_final, d_boundary = cotangents
    label_axis = 0 if layout == "tlb" else 1
    max_t = em_shape[0]
    max_s = em_shape[1 + label_axis]
    batch = em_shape[2 - label_axis]
    l_pad = alpha_p.shape[1 + label_axis]
    b_pad = alpha_p.shape[2 - label_axis]
    skip_p, tgt, _ = _pads(
        skip_ok, inlen_local, target_lengths, b_pad, l_pad, label_axis
    )
    inl = jnp.pad(inlen_local, (0, b_pad - batch), constant_values=0)
    bar = jnp.pad(d_final, (0, b_pad - batch))
    # final-cell injection: d(final)/d(alpha[t_own, s]) = softmax over the
    # two final cells (positive — the op returns final, not nll)
    a_a, a_b = _final_cells(alpha_p, tgt, inl, max_t, label_axis)
    lse_f = jnp.where(tgt > 0, jnp.logaddexp(a_a, a_b), a_a)
    w_a = jnp.exp(a_a - lse_f)
    w_b = jnp.where(tgt > 0, jnp.exp(a_b - lse_f), 0.0)
    s_a = jnp.clip(2 * tgt, 0, l_pad - 1)
    s_b = jnp.clip(2 * tgt - 1, 0, l_pad - 1)
    pos = jnp.arange(l_pad)
    if label_axis == 0:
        inject = (
            jnp.where(pos[:, None] == s_a[None, :], (bar * w_a)[None, :], 0.0)
            + jnp.where(
                jnp.logical_and(
                    pos[:, None] == s_b[None, :], tgt[None, :] > 0
                ),
                (bar * w_b)[None, :],
                0.0,
            )
        ).astype(alpha_p.dtype)
        inlen_b = jnp.broadcast_to(inl[None, :], (l_pad, b_pad)).astype(
            jnp.float32
        )
    else:
        inject = (
            jnp.where(pos[None, :] == s_a[:, None], (bar * w_a)[:, None], 0.0)
            + jnp.where(
                jnp.logical_and(
                    pos[None, :] == s_b[:, None], tgt[:, None] > 0
                ),
                (bar * w_b)[:, None],
                0.0,
            )
        ).astype(alpha_p.dtype)
        inlen_b = jnp.broadcast_to(inl[:, None], (b_pad, l_pad)).astype(
            jnp.float32
        )
    g_seed = _orient_row(
        jnp.pad(d_boundary, ((0, b_pad - batch), (0, 0))), label_axis
    ).astype(alpha_p.dtype)
    tile, chunk = _tiles_for(max_t, max_s, layout, interpret, tiles, batch)
    g_p = _backward_boundary_padded(
        alpha_p, skip_p, inject, inlen_b, g_seed, max_s=max_s, tile=tile,
        chunk=chunk, label_axis=label_axis, t_last=max_t - 1,
        interpret=interpret,
    )
    g = g_p[:max_t]
    g = g[:, :, :batch] if label_axis == 0 else g[:, :batch]
    # d(init0)/d(skip0): the first local step is
    #   alpha_0 = logaddexp3(init0, lab0-masked roll1(init0),
    #                        skip_ok-masked roll2(skip0)) + em_0
    # so the init rows' cotangents are one 3-way-softmax step off g[0].
    g0_slab = g_p[0]  # label width max_s (unpadded g output)
    g0 = (g0_slab.T if label_axis == 0 else g0_slab)
    g0 = jnp.pad(g0, ((0, 0), (0, l_pad - max_s)))  # [b_pad, l_pad]
    row_pad = ((0, b_pad - batch), (0, l_pad - init0.shape[1]))
    init0_p = jnp.pad(init0, row_pad, constant_values=BLANK_NEG)
    skip0_p = jnp.pad(skip0, row_pad, constant_values=BLANK_NEG)
    skip_bl = skip_p.T if label_axis == 0 else skip_p  # [b_pad, l_pad]
    neg = jnp.full((b_pad, 1), BLANK_NEG, init0_p.dtype)
    a_stay = init0_p
    a_adv = jnp.concatenate([neg, init0_p[:, :-1]], axis=1)
    a_skip = jnp.where(
        skip_bl > 0.5,
        jnp.concatenate([neg, neg, skip0_p[:, :-2]], axis=1),
        BLANK_NEG,
    )
    lse = jnp.logaddexp(jnp.logaddexp(a_stay, a_adv), a_skip)
    w_stay = jnp.exp(a_stay - lse)
    w_adv = jnp.exp(a_adv - lse)
    w_skip = jnp.exp(a_skip - lse)
    zeros1 = jnp.zeros((b_pad, 1), g0.dtype)
    d_init0 = g0 * w_stay + jnp.concatenate(
        [(g0 * w_adv)[:, 1:], zeros1], axis=1
    )
    d_skip0 = jnp.concatenate(
        [(g0 * w_skip)[:, 2:], zeros1, zeros1], axis=1
    )
    w = init0.shape[1]
    return (g, d_init0[:batch, :w], d_skip0[:batch, :w], None, None, None)


blank_shard_lattice_pallas.defvjp(_shard_fwd, _shard_bwd)
