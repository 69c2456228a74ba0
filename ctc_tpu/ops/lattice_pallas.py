"""Pallas TPU kernels for the blank-free CTC lattice.

Replaces the reference's interpreted per-cell python DP
(/root/reference/NoBlankCTC.py:90-126 — ~T*B*L python steps plus an autograd
graph per batch) with two on-chip kernels:

* forward: the alpha recursion as a ``fori_loop`` over a T-chunk held in
  VMEM — the advance transition a 1-step roll along the label axis.  Emits
  the full alpha lattice (the residual the backward pass needs).
* backward: the reverse occupancy recursion (same lattice, weights read off
  sigmoid(stay - advance) exactly like
  :func:`ctc_tpu.ops.lattice_xla._nll_bwd`), emitting d(nll)/d(emissions).

Two data layouts, same math:

* ``'tbl'`` — emissions ``[T, B, L]``: batch on sublanes, label-path
  positions on lanes.  L is padded to the 128-lane tile, so at L=157 the
  VPU does 63% wasted lanes.
* ``'tlb'`` — emissions ``[T, L, B]`` (the native layout the losses emit):
  label positions on sublanes (padded to 8 — 2% waste at L=157), batch on
  lanes.  ~1.6x less vector work at the production shape; the emission
  builders produce this layout for free (einsum output order / fused
  transpose), so nothing pays a transpose.

Pipelining: the grid is ``(batch_tiles, time_chunks)`` with the per-tile
alpha (forward) / g (backward) carry living in VMEM scratch across the
sequentially-executed time chunks.  Chunking T keeps each streamed block
small (so the Pallas pipeline overlaps HBM traffic with compute) while
letting the batch tile grow, which is what feeds the VPU.  The emission
input and gradient output blocks keep their unpadded label width in HBM —
widening/narrowing happens in VMEM per step, so no XLA pad/slice copies.

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
_SUBLANE = 8
# batch tiles are independent -> 'parallel' lets Mosaic split them across
# TensorCores on megacore chips; time chunks carry scratch -> 'arbitrary'.
_GRID_SEMANTICS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary")
)
# VMEM budget per kernel: in/out [chunk, ...] blocks are double-buffered by
# the pipeline (4 live blocks) plus the slab-sized carry scratch; keep the
# total under ~14MB (the remote compiler rejects kernels above that).
_VMEM_BUDGET = 14 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _label_index(shape, label_axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=label_axis)


def _widen(x, l_pad, label_axis):
    """Zero-pad the label axis of a 2D slab up to l_pad (in-VMEM)."""
    w = x.shape[label_axis]
    if w == l_pad:
        return x
    pad = [(0, 0), (0, 0)]
    pad[label_axis] = (0, l_pad - w)
    return jnp.pad(x, pad, constant_values=0.0)


def _narrow(x, l_out, label_axis):
    if x.shape[label_axis] == l_out:
        return x
    return x[:l_out] if label_axis == 0 else x[:, :l_out]


def _choose_tiles(max_t: int, max_l: int, layout: str,
                  batch: int) -> tuple[int, int]:
    """(batch_tile, t_chunk): widest batch tile whose pipeline fits VMEM.

    Prefers batch-tile width (more VPU work per scan step) over chunk depth;
    chunk depth only needs to be large enough for reasonable DMA granularity.
    """
    l_pad = _round_up(max_l, _SUBLANE if layout == "tlb" else _LANE)
    if layout == "tlb":
        # Scale the batch tile inversely with the slab height so every scan
        # step keeps ~20 vregs (tile * l_pad ≈ 128 lanes * 160 sublanes) of
        # VPU work — enough to amortize the per-step fixed costs (rolls,
        # loop overhead, DMA granularity).  At l_pad=160 that is tile=128,
        # measured fastest at the no-blank bench shape (probe_roofline.py:
        # (128,16) 1.047 ms vs (256,16) 1.093 / (512,8) 1.173 fwd+bwd); at
        # the blank kernel's l_pad=48, tile=512 is ~25% faster than 128
        # (probe_blank_tiles.py: 1.09 ms vs 1.41 ms fwd+bwd).  Larger tiles
        # past that point stop helping — one v5e core means tile count adds
        # no parallelism — so clamp at 512.
        # Tile widths come from the PROBED set {128, 256, 512} only — the
        # remote Mosaic compiler is fragile at unprobed configurations
        # (HTTP-500s/hangs, CLAUDE.md), so never synthesize e.g. 384.
        raw = _LANE * 160 // l_pad  # the ~20-vreg target
        ideal = next((t for t in (128, 256, 512) if t >= raw), 512)
        # Never exceed the batch (rounded DOWN to the nearest probed width):
        # a tile wider than the batch pads B up to the tile and burns the
        # surplus on dead lanes (seen as a 2x train-step regression at
        # B=256 with tile=512).
        b128 = _round_up(batch, 128)
        cap = next((t for t in (512, 256, 128) if t <= b128), 128)
        if cap < ideal:
            # The batch is too small for the vreg-target tile.  Measured
            # (probe_binary_ab.py, r4 — the r3 binary-e2e drift): when the
            # cap binds, taking the capped width is a LOSS — at the binary
            # bench shape (l_pad=32, B=256; ideal 512, cap 256) tile 256
            # ran 1.0-2.0 ms e2e vs 0.82-0.85 at 128, while the lattice
            # kernel alone was tile-insensitive (0.66-0.67 ms flat at
            # 128/256/512) — the cost lives in the emission-einsum/kernel
            # block interaction.  128 (the most-pipelined probed width)
            # reproduces r2's committed number; the train-step shape
            # measured tile-indifferent (0.11-0.14 ms at 128 and 256).
            ideal = 128
        # ideal first; if it overflows VMEM only *smaller* tiles can fit.
        tiles = (ideal,) + tuple(t for t in (512, 256, 128) if t < ideal)
    else:
        tiles = (128, 64, 32, 16, 8)
    for tile in tiles:
        for chunk in (16, 32, 8):
            blocks = 4 * chunk * tile * l_pad * 4  # double-buffered in+out
            scratch = tile * l_pad * 4
            rows = 4 * tile * l_pad * 4  # mask/row operands
            if blocks + scratch + rows <= _VMEM_BUDGET:
                return tile, min(chunk, _round_up(max_t, _SUBLANE))
    return tiles[-1], min(8, _round_up(max_t, _SUBLANE))


def _forward_kernel(em_ref, outside_ref, alpha_out_ref, carry_ref, *,
                    label_axis):
    """alpha recursion for one (chunk, slab) block; carry across chunks.

    The emission block's label width may be unpadded: it is widened to the
    compute width in VMEM per step, so the caller never pays an HBM pad
    copy.  alpha (the backward residual) stays at the compute width.
    """
    chunk = em_ref.shape[0]
    slab = alpha_out_ref.shape[1:]  # compute-width 2D slab
    l_pad = slab[label_axis]
    outside = outside_ref[:] > 0.5
    lab0 = _label_index(slab, label_axis) == 0
    pid_t = pl.program_id(1)

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = jnp.where(lab0, 0.0, NEG_SENTINEL).astype(
            carry_ref.dtype
        )

    def body(i, alpha):
        t = pid_t * chunk + i
        shifted = pltpu.roll(alpha, shift=1, axis=label_axis)
        shifted = jnp.where(lab0, NEG_SENTINEL, shifted)
        # t == 0 has no advance branch; the reference still log-adds the
        # sentinel row there (NoBlankCTC.py:73-78).
        shifted = jnp.where(t > 0, shifted, NEG_SENTINEL)
        lse = jnp.logaddexp(alpha, shifted)
        lse = jnp.where(outside, NEG_SENTINEL, lse)
        alpha = lse + _widen(em_ref[i], l_pad, label_axis)
        alpha_out_ref[i] = alpha
        return alpha

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


def _backward_kernel(
    alpha_ref, inject_row_ref, inlen_ref, inside_ref, g_out_ref, carry_ref,
    *, label_axis
):
    """Reverse posterior recursion; emits g = d(nll)/d(emissions).

    Time chunks are visited in reverse (the index maps flip the t grid
    axis); the g carry persists in scratch across chunks.  The g output
    block's label width may be unpadded: the carry/compute run at the
    compute width and each step stores the narrowed slab, so the caller
    never pays an HBM slice copy.
    """
    chunk = alpha_ref.shape[0]
    slab = alpha_ref.shape[1:]
    l_out = g_out_ref.shape[1 + label_axis]
    n_t = pl.num_programs(1)
    pid_t = pl.program_id(1)
    max_t = n_t * chunk
    t0 = (n_t - 1 - pid_t) * chunk  # global t of this block's first row
    inside = inside_ref[:] > 0.5
    lab_idx = _label_index(slab, label_axis)
    lab0 = lab_idx == 0
    last_lab = lab_idx == (slab[label_axis] - 1)
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
            alpha_prev = alpha_ref[ti]  # alpha at step t == prev for t+1
            adv = pltpu.roll(alpha_prev, shift=1, axis=label_axis)
            adv = jnp.where(lab0, NEG_SENTINEL, adv)
            # one transcendental: sigmoid(-x) == 1 - sigmoid(x)
            w_stay_raw = jax.nn.sigmoid(alpha_prev - adv)
            w_stay = w_stay_raw * inside
            w_adv = (1.0 - w_stay_raw) * inside
            from_adv = g_next * w_adv
            # shift back by one label == roll by size-1 (shift must be >= 0)
            from_adv = jnp.where(
                last_lab,
                0.0,
                pltpu.roll(
                    from_adv, shift=slab[label_axis] - 1, axis=label_axis
                ),
            )
            return g_next * w_stay + from_adv

        prop = jnp.where(t < max_t - 1, with_prop(), 0.0)
        g_t = inject_t + prop
        g_out_ref[ti] = _narrow(g_t, l_out, label_axis)
        return g_t

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


def _forward_kernel_boundary(em_ref, outside_ref, stay0_ref, adv0_ref,
                             alpha_out_ref, carry_ref, *, label_axis):
    """Boundary-aware forward: the in-kernel lab0 init is replaced by TWO
    init rows (docs/ROOFLINE.md "future work" design, now built):

    * ``stay0`` — alpha(-1) for the stay branch of the first local step;
    * ``adv0``  — alpha(-1) for the advance (roll) branch.

    For the pipeline's shard 0 they differ (``stay0`` = standard init,
    ``adv0`` = all-sentinel, encoding "no advance at t=0" without a scalar
    t-offset); between shards both equal the incoming boundary alpha row.
    The outgoing boundary is a slice of the alpha output — single-output
    kernel (multi-output pallas_call hangs the remote Mosaic compiler).
    """
    chunk = em_ref.shape[0]
    slab = alpha_out_ref.shape[1:]
    l_pad = slab[label_axis]
    outside = outside_ref[:] > 0.5
    lab0 = _label_index(slab, label_axis) == 0
    pid_t = pl.program_id(1)
    adv0 = adv0_ref[:]

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = stay0_ref[:]

    def body(i, alpha):
        t = pid_t * chunk + i
        src = jnp.where(t == 0, adv0, alpha)
        shifted = pltpu.roll(src, shift=1, axis=label_axis)
        shifted = jnp.where(lab0, NEG_SENTINEL, shifted)
        lse = jnp.logaddexp(alpha, shifted)
        lse = jnp.where(outside, NEG_SENTINEL, lse)
        alpha = lse + _widen(em_ref[i], l_pad, label_axis)
        alpha_out_ref[i] = alpha
        return alpha

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


def _backward_kernel_boundary(
    alpha_ref, inject_row_ref, inlen_ref, inside_ref, g_seed_ref, g_out_ref,
    carry_ref, *, label_axis, t_last
):
    """Boundary-aware reverse recursion: ``g_seed`` (the cotangent of the
    outgoing boundary row, handed back by the downstream shard / the
    pipeline transpose) is injected at the shard's last REAL row
    ``t_last`` (static — T padding rows above it carry exactly-zero g).
    ``inlen`` is SHARD-LOCAL (``inlen - t_offset``): non-owning shards
    never match the final-cell inject."""
    chunk = alpha_ref.shape[0]
    slab = alpha_ref.shape[1:]
    l_out = g_out_ref.shape[1 + label_axis]
    n_t = pl.num_programs(1)
    pid_t = pl.program_id(1)
    t0 = (n_t - 1 - pid_t) * chunk
    inside = inside_ref[:] > 0.5
    lab_idx = _label_index(slab, label_axis)
    lab0 = lab_idx == 0
    last_lab = lab_idx == (slab[label_axis] - 1)
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
            adv = pltpu.roll(alpha_prev, shift=1, axis=label_axis)
            adv = jnp.where(lab0, NEG_SENTINEL, adv)
            w_stay_raw = jax.nn.sigmoid(alpha_prev - adv)
            w_stay = w_stay_raw * inside
            w_adv = (1.0 - w_stay_raw) * inside
            from_adv = g_next * w_adv
            from_adv = jnp.where(
                last_lab,
                0.0,
                pltpu.roll(
                    from_adv, shift=slab[label_axis] - 1, axis=label_axis
                ),
            )
            return g_next * w_stay + from_adv

        # the boundary cotangent lands on the last real row; rows above it
        # (T padding) propagate zero g, rows below propagate normally
        prop = jnp.where(t < t_last, with_prop(), 0.0)
        g_t = inject_t + jnp.where(t == t_last, g_seed, 0.0) + prop
        g_out_ref[ti] = _narrow(g_t, l_out, label_axis)
        return g_t

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])


def _pad_tb(x, t_pad, b_pad, label_axis, fill):
    """Pad time and batch axes only (label axis stays unpadded)."""
    max_t = x.shape[0]
    b_axis = 2 if label_axis == 0 else 1
    pad = [(0, t_pad - max_t), (0, 0), (0, 0)]
    pad[b_axis] = (0, b_pad - x.shape[b_axis])
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "label_axis", "interpret")
)
def _forward_padded(em_p, outside_p, *, tile, chunk, label_axis,
                    interpret=False):
    """em_p's label axis may be unpadded; alpha out is at outside_p's width."""
    t_pad = em_p.shape[0]
    max_l = em_p.shape[1 + label_axis]
    l_pad = outside_p.shape[label_axis]
    b_pad = em_p.shape[2 - label_axis]
    grid = (b_pad // tile, t_pad // chunk)
    if label_axis == 0:
        blk = lambda l_dim: (chunk,) + (l_dim, tile)
        tbl_map = lambda i, j: (j, 0, i)
        row_map = lambda i, j: (0, i)
    else:
        blk = lambda l_dim: (chunk,) + (tile, l_dim)
        tbl_map = lambda i, j: (j, i, 0)
        row_map = lambda i, j: (i, 0)
    em_spec = pl.BlockSpec(blk(max_l), tbl_map, memory_space=pltpu.VMEM)
    alpha_spec = pl.BlockSpec(blk(l_pad), tbl_map, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(blk(l_pad)[1:], row_map, memory_space=pltpu.VMEM)
    out_shape = (
        (t_pad, l_pad, b_pad) if label_axis == 0 else (t_pad, b_pad, l_pad)
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel, label_axis=label_axis),
        out_shape=jax.ShapeDtypeStruct(out_shape, em_p.dtype),
        grid=grid,
        in_specs=[em_spec, row_spec],
        out_specs=alpha_spec,
        scratch_shapes=[pltpu.VMEM(blk(l_pad)[1:], em_p.dtype)],
        compiler_params=None if interpret else _GRID_SEMANTICS,
        interpret=interpret,
    )(em_p, outside_p)


@functools.partial(
    jax.jit,
    static_argnames=("max_l", "tile", "chunk", "label_axis", "interpret"),
)
def _backward_padded(alpha_p, inject_row_p, inlen_p, inside_p, *, max_l, tile,
                     chunk, label_axis, interpret=False):
    """alpha_p is at the compute width; the g output's label axis is max_l
    wide (possibly unpadded — stored narrowed in-kernel)."""
    t_pad = alpha_p.shape[0]
    l_pad = alpha_p.shape[1 + label_axis]
    b_pad = alpha_p.shape[2 - label_axis]
    n_t = t_pad // chunk
    grid = (b_pad // tile, n_t)
    if label_axis == 0:
        blk = lambda l_dim: (chunk, l_dim, tile)
        rev_map = lambda i, j: (n_t - 1 - j, 0, i)
        row_map = lambda i, j: (0, i)
        g_shape = (t_pad, max_l, b_pad)
    else:
        blk = lambda l_dim: (chunk, tile, l_dim)
        rev_map = lambda i, j: (n_t - 1 - j, i, 0)
        row_map = lambda i, j: (i, 0)
        g_shape = (t_pad, b_pad, max_l)
    alpha_spec = pl.BlockSpec(blk(l_pad), rev_map, memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec(blk(max_l), rev_map, memory_space=pltpu.VMEM)
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
    )(alpha_p, inject_row_p, inlen_p, inside_p)


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "label_axis", "interpret")
)
def _forward_boundary_padded(em_p, outside_p, stay0_p, adv0_p, *, tile, chunk,
                             label_axis, interpret=False):
    """Boundary-init forward: like :func:`_forward_padded` plus the two
    init-row slabs (kernel orientation, compute width)."""
    t_pad = em_p.shape[0]
    max_l = em_p.shape[1 + label_axis]
    l_pad = outside_p.shape[label_axis]
    b_pad = em_p.shape[2 - label_axis]
    grid = (b_pad // tile, t_pad // chunk)
    if label_axis == 0:
        blk = lambda l_dim: (chunk,) + (l_dim, tile)
        tbl_map = lambda i, j: (j, 0, i)
        row_map = lambda i, j: (0, i)
    else:
        blk = lambda l_dim: (chunk,) + (tile, l_dim)
        tbl_map = lambda i, j: (j, i, 0)
        row_map = lambda i, j: (i, 0)
    em_spec = pl.BlockSpec(blk(max_l), tbl_map, memory_space=pltpu.VMEM)
    alpha_spec = pl.BlockSpec(blk(l_pad), tbl_map, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(blk(l_pad)[1:], row_map, memory_space=pltpu.VMEM)
    out_shape = (
        (t_pad, l_pad, b_pad) if label_axis == 0 else (t_pad, b_pad, l_pad)
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel_boundary, label_axis=label_axis),
        out_shape=jax.ShapeDtypeStruct(out_shape, em_p.dtype),
        grid=grid,
        in_specs=[em_spec, row_spec, row_spec, row_spec],
        out_specs=alpha_spec,
        scratch_shapes=[pltpu.VMEM(blk(l_pad)[1:], em_p.dtype)],
        compiler_params=None if interpret else _GRID_SEMANTICS,
        interpret=interpret,
    )(em_p, outside_p, stay0_p, adv0_p)


@functools.partial(
    jax.jit,
    static_argnames=("max_l", "tile", "chunk", "label_axis", "t_last",
                     "interpret"),
)
def _backward_boundary_padded(alpha_p, inject_row_p, inlen_p, inside_p,
                              g_seed_p, *, max_l, tile, chunk, label_axis,
                              t_last, interpret=False):
    """Boundary backward: like :func:`_backward_padded` plus the boundary
    cotangent seed row, injected at the static last real row ``t_last``."""
    t_pad = alpha_p.shape[0]
    l_pad = alpha_p.shape[1 + label_axis]
    b_pad = alpha_p.shape[2 - label_axis]
    n_t = t_pad // chunk
    grid = (b_pad // tile, n_t)
    if label_axis == 0:
        blk = lambda l_dim: (chunk, l_dim, tile)
        rev_map = lambda i, j: (n_t - 1 - j, 0, i)
        row_map = lambda i, j: (0, i)
        g_shape = (t_pad, max_l, b_pad)
    else:
        blk = lambda l_dim: (chunk, tile, l_dim)
        rev_map = lambda i, j: (n_t - 1 - j, i, 0)
        row_map = lambda i, j: (i, 0)
        g_shape = (t_pad, b_pad, max_l)
    alpha_spec = pl.BlockSpec(blk(l_pad), rev_map, memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec(blk(max_l), rev_map, memory_space=pltpu.VMEM)
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
    )(alpha_p, inject_row_p, inlen_p, inside_p, g_seed_p)


def _masks(input_lengths, target_lengths, b_pad, l_pad, label_axis):
    """(outside, tgt, inl): outside is a float slab in kernel orientation."""
    batch = target_lengths.shape[0]
    tgt = jnp.pad(target_lengths, (0, b_pad - batch), constant_values=1)
    inl = jnp.pad(input_lengths, (0, b_pad - batch), constant_values=1)
    pos = jnp.arange(l_pad)
    if label_axis == 0:  # slab (L, B)
        outside = (pos[:, None] >= tgt[None, :]).astype(jnp.float32)
    else:  # slab (B, L)
        outside = (pos[None, :] >= tgt[:, None]).astype(jnp.float32)
    return outside, tgt, inl


def _tiles_for(max_t, max_l, layout, interpret, override, batch):
    if override is not None:
        return override
    if interpret:
        # interpret mode (CPU tests): smallest tile, single chunk — padding
        # rows and extra grid steps are pure interpreted-python waste.
        return _B_TILE, _round_up(max_t, _SUBLANE)
    return _choose_tiles(max_t, max_l, layout, batch)


def _run_forward(emissions, input_lengths, target_lengths, layout, interpret,
                 tiles=None):
    label_axis = 0 if layout == "tlb" else 1
    max_t = emissions.shape[0]
    max_l = emissions.shape[1 + label_axis]
    batch = emissions.shape[2 - label_axis]
    l_pad = _round_up(max_l, _SUBLANE if layout == "tlb" else _LANE)
    tile, chunk = _tiles_for(max_t, max_l, layout, interpret, tiles, batch)
    t_pad = _round_up(max_t, chunk)
    b_pad = _round_up(batch, tile)
    # label axis stays unpadded — the kernel widens it in VMEM (no HBM pad
    # copy); T/B pads are no-ops when already aligned.
    em_p = _pad_tb(emissions, t_pad, b_pad, label_axis, 0.0)
    outside, tgt, inl = _masks(
        input_lengths, target_lengths, b_pad, l_pad, label_axis
    )
    alpha_p = _forward_padded(
        em_p, outside, tile=tile, chunk=chunk, label_axis=label_axis,
        interpret=interpret,
    )
    # nll = -alpha[T_b-1, b, L_b-1] — gather in XLA.
    l_idx = jnp.clip(tgt - 1, 0, l_pad - 1)
    if label_axis == 0:
        at_l = jnp.take_along_axis(alpha_p, l_idx[None, None, :], axis=1)[
            :, 0, :
        ]  # [T_pad, b_pad]
    else:
        at_l = jnp.take_along_axis(alpha_p, l_idx[None, :, None], axis=2)[
            ..., 0
        ]  # [T_pad, b_pad]
    final = jnp.take_along_axis(
        at_l, jnp.clip(inl - 1, 0, max_t - 1)[None, :], axis=0
    )[0]  # [b_pad]
    return -final[:batch], alpha_p


def noblank_lattice_nll_pallas(
    emissions, input_lengths, target_lengths, *, layout="tbl",
    interpret=False, tiles=None
):
    """Per-sample NLL ``[B]``; Pallas-accelerated, analytic gradient.

    ``layout='tbl'`` takes emissions ``[T, B, L]``; ``layout='tlb'`` takes
    ``[T, L, B]`` (the native layout — label positions on sublanes, ~1.6x
    faster at L=157).  ``tiles=(batch_tile, t_chunk)`` overrides the auto
    block layout (probing/tests).
    """
    return _nll_pallas(
        emissions, input_lengths, target_lengths, layout, interpret, tiles
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _nll_pallas(emissions, input_lengths, target_lengths, layout, interpret,
                tiles):
    nll, _ = _run_forward(
        emissions, input_lengths, target_lengths, layout, interpret, tiles
    )
    return nll


def _nll_pallas_fwd(emissions, input_lengths, target_lengths, layout,
                    interpret, tiles):
    nll, alpha_p = _run_forward(
        emissions, input_lengths, target_lengths, layout, interpret, tiles
    )
    return nll, (alpha_p, input_lengths, target_lengths, emissions.shape)


def _nll_pallas_bwd(layout, interpret, tiles, residuals, nll_bar):
    alpha_p, input_lengths, target_lengths, em_shape = residuals
    label_axis = 0 if layout == "tlb" else 1
    max_t = em_shape[0]
    max_l = em_shape[1 + label_axis]
    batch = em_shape[2 - label_axis]
    l_pad = alpha_p.shape[1 + label_axis]
    b_pad = alpha_p.shape[2 - label_axis]
    outside, tgt, inl = _masks(
        input_lengths, target_lengths, b_pad, l_pad, label_axis
    )
    inside = 1.0 - outside
    bar = jnp.pad(nll_bar, (0, b_pad - batch))
    pos = jnp.arange(l_pad)
    if label_axis == 0:
        inject_row = jnp.where(
            pos[:, None] == (tgt - 1)[None, :], -bar[None, :], 0.0
        ).astype(alpha_p.dtype)
        inlen_b = jnp.broadcast_to(inl[None, :], (l_pad, b_pad)).astype(
            jnp.float32
        )
    else:
        inject_row = jnp.where(
            pos[None, :] == (tgt - 1)[:, None], -bar[:, None], 0.0
        ).astype(alpha_p.dtype)
        inlen_b = jnp.broadcast_to(inl[:, None], (b_pad, l_pad)).astype(
            jnp.float32
        )
    tile, chunk = _tiles_for(
        max_t, max_l, layout, interpret, tiles, batch
    )
    g_p = _backward_padded(
        alpha_p, inject_row, inlen_b, inside, max_l=max_l, tile=tile,
        chunk=chunk, label_axis=label_axis, interpret=interpret,
    )
    # label axis already narrow; T/B slices are no-ops when aligned
    g = g_p[:max_t]
    g = g[:, :, :batch] if label_axis == 0 else g[:, :batch]
    return (g, None, None)


_nll_pallas.defvjp(_nll_pallas_fwd, _nll_pallas_bwd)


# ---------------------------------------------------------------------------
# Boundary-aware shard op: the kernel inside the sequence-sharded pipeline
# (ctc_tpu/parallel/seq_lattice.py).  One shard's T-slice of the lattice as
# a differentiable op: (emissions, stay0, adv0) -> (final, boundary_out).
# ---------------------------------------------------------------------------


def boundary_width(max_l: int, layout: str = "tlb") -> int:
    """Width of the boundary alpha rows exchanged between shards (the
    kernel's compute width — label axis padded to its tile unit)."""
    return _round_up(max_l, _SUBLANE if layout == "tlb" else _LANE)


def _orient_row(row_bl, label_axis):
    """[B, l_pad] row -> kernel slab orientation."""
    return row_bl.T if label_axis == 0 else row_bl


def _run_shard_forward(em, stay0, adv0, inlen_local, target_lengths, layout,
                       interpret, tiles):
    label_axis = 0 if layout == "tlb" else 1
    max_t = em.shape[0]
    max_l = em.shape[1 + label_axis]
    batch = em.shape[2 - label_axis]
    l_pad = boundary_width(max_l, layout)
    tile, chunk = _tiles_for(max_t, max_l, layout, interpret, tiles, batch)
    t_pad = _round_up(max_t, chunk)
    b_pad = _round_up(batch, tile)
    em_p = _pad_tb(em, t_pad, b_pad, label_axis, 0.0)
    outside, tgt, _ = _masks(
        inlen_local, target_lengths, b_pad, l_pad, label_axis
    )
    row_pad = ((0, b_pad - batch), (0, l_pad - stay0.shape[1]))
    stay0_p = _orient_row(
        jnp.pad(stay0, row_pad, constant_values=NEG_SENTINEL), label_axis
    )
    adv0_p = _orient_row(
        jnp.pad(adv0, row_pad, constant_values=NEG_SENTINEL), label_axis
    )
    alpha_p = _forward_boundary_padded(
        em_p, outside, stay0_p, adv0_p, tile=tile, chunk=chunk,
        label_axis=label_axis, interpret=interpret,
    )
    # per-sample final candidate: alpha[inlen_local-1, b, tgt-1], owned by
    # this shard only when 1 <= inlen_local <= t_shard
    inl = jnp.pad(inlen_local, (0, b_pad - batch), constant_values=0)
    l_idx = jnp.clip(tgt - 1, 0, l_pad - 1)
    if label_axis == 0:
        at_l = jnp.take_along_axis(alpha_p, l_idx[None, None, :], axis=1)[
            :, 0, :
        ]
    else:
        at_l = jnp.take_along_axis(alpha_p, l_idx[None, :, None], axis=2)[
            ..., 0
        ]
    gathered = jnp.take_along_axis(
        at_l, jnp.clip(inl - 1, 0, max_t - 1)[None, :], axis=0
    )[0]
    own = (inl >= 1) & (inl <= max_t)
    final = jnp.where(own, gathered, 0.0)[:batch]
    # outgoing boundary = the last REAL alpha row (design: a slice of the
    # single kernel output, no multi-output pallas_call)
    brow = alpha_p[max_t - 1]
    boundary = (brow.T if label_axis == 0 else brow)[:batch]
    return final, boundary, alpha_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def noblank_shard_lattice_pallas(em, stay0, adv0, inlen_local, target_lengths,
                                 layout="tlb", interpret=False, tiles=None):
    """One sequence-shard of the blank-free lattice as a Pallas-kernel op.

    Args:
      em: this shard's emissions — ``[t_s, L, B]`` (``layout='tlb'``) or
        ``[t_s, B, L]`` (``'tbl'``); the label axis may be pre-padded to
        :func:`boundary_width`.
      stay0 / adv0: ``[B, W]`` init rows (``W = boundary_width``) — the
        incoming boundary alpha for both on interior shards; the standard
        init / all-sentinel pair on shard 0.
      inlen_local: ``[B]`` SHARD-LOCAL input lengths (``inlen - t_offset``;
        values outside ``[1, t_s]`` mean this shard does not own the
        sample's final cell).
      target_lengths: ``[B]``.

    Returns ``(final [B], boundary_out [B, W])`` — the per-sample final
    log-prob candidate (0 on non-owning shards) and the outgoing boundary
    alpha row.  Differentiable in ``em``/``stay0``/``adv0`` via the
    boundary backward kernel.
    """
    final, boundary, _ = _run_shard_forward(
        em, stay0, adv0, inlen_local, target_lengths, layout, interpret,
        tiles,
    )
    return final, boundary


def _shard_fwd(em, stay0, adv0, inlen_local, target_lengths, layout,
               interpret, tiles):
    final, boundary, alpha_p = _run_shard_forward(
        em, stay0, adv0, inlen_local, target_lengths, layout, interpret,
        tiles,
    )
    return (final, boundary), (
        alpha_p, stay0, adv0, inlen_local, target_lengths, em.shape
    )


def _shard_bwd(layout, interpret, tiles, residuals, cotangents):
    alpha_p, stay0, adv0, inlen_local, target_lengths, em_shape = residuals
    d_final, d_boundary = cotangents
    label_axis = 0 if layout == "tlb" else 1
    max_t = em_shape[0]
    max_l = em_shape[1 + label_axis]
    batch = em_shape[2 - label_axis]
    l_pad = alpha_p.shape[1 + label_axis]
    b_pad = alpha_p.shape[2 - label_axis]
    outside, tgt, _ = _masks(
        inlen_local, target_lengths, b_pad, l_pad, label_axis
    )
    inside = 1.0 - outside
    inl = jnp.pad(inlen_local, (0, b_pad - batch), constant_values=0)
    bar = jnp.pad(d_final, (0, b_pad - batch))
    pos = jnp.arange(l_pad)
    if label_axis == 0:
        inject_row = jnp.where(
            pos[:, None] == (tgt - 1)[None, :], bar[None, :], 0.0
        ).astype(alpha_p.dtype)
        inlen_b = jnp.broadcast_to(inl[None, :], (l_pad, b_pad)).astype(
            jnp.float32
        )
    else:
        inject_row = jnp.where(
            pos[None, :] == (tgt - 1)[:, None], bar[:, None], 0.0
        ).astype(alpha_p.dtype)
        inlen_b = jnp.broadcast_to(inl[:, None], (b_pad, l_pad)).astype(
            jnp.float32
        )
    g_seed = _orient_row(
        jnp.pad(d_boundary, ((0, b_pad - batch), (0, 0))), label_axis
    ).astype(alpha_p.dtype)
    tile, chunk = _tiles_for(max_t, max_l, layout, interpret, tiles, batch)
    g_p = _backward_boundary_padded(
        alpha_p, inject_row, inlen_b, inside, g_seed, max_l=max_l, tile=tile,
        chunk=chunk, label_axis=label_axis, t_last=max_t - 1,
        interpret=interpret,
    )
    g = g_p[:max_t]
    g = g[:, :, :batch] if label_axis == 0 else g[:, :batch]
    # d(stay0)/d(adv0): one elementwise step off the kernel's g[0] row —
    # the first local step is alpha_0 = where(outside, SENT,
    # logaddexp(stay0, lab0-masked roll(adv0))) + em_0, so the init rows'
    # cotangents are the same sigmoid branch weights as everywhere else.
    g0_slab = g_p[0]  # label width max_l (the g output is unpadded)
    g0 = (g0_slab.T if label_axis == 0 else g0_slab)  # [b_pad, max_l]
    g0 = jnp.pad(g0, ((0, 0), (0, l_pad - max_l)))  # zero-g padded labels
    row_pad = ((0, b_pad - batch), (0, l_pad - stay0.shape[1]))
    stay0_p = jnp.pad(stay0, row_pad, constant_values=NEG_SENTINEL)
    adv0_p = jnp.pad(adv0, row_pad, constant_values=NEG_SENTINEL)
    shifted = jnp.concatenate(
        [
            jnp.full((b_pad, 1), NEG_SENTINEL, adv0_p.dtype),
            adv0_p[:, :-1],
        ],
        axis=1,
    )
    inside_b = inside if label_axis == 1 else inside.T  # [b_pad, l_pad]
    w_stay_raw = jax.nn.sigmoid(stay0_p - shifted)
    d_stay0 = g0 * w_stay_raw * inside_b
    d_shift = g0 * (1.0 - w_stay_raw) * inside_b
    d_adv0 = jnp.concatenate(
        [d_shift[:, 1:], jnp.zeros((b_pad, 1), d_shift.dtype)], axis=1
    )
    w = stay0.shape[1]
    return (g, d_stay0[:batch, :w], d_adv0[:batch, :w], None, None)


noblank_shard_lattice_pallas.defvjp(_shard_fwd, _shard_bwd)
