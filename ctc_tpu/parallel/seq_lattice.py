"""Sequence-sharded lattice: the time axis split across a ``seq`` mesh axis.

The blank-free DP is sequential in T, so a T-sharded lattice is computed as a
**carry-passing pipeline**: shard k scans its local T/n timesteps and hands
the boundary alpha row to shard k+1 via ``lax.ppermute`` (SURVEY.md §5.7).
To keep chips busy the batch is split into n microbatches flowing through the
pipeline wavefront-style — after the n-step fill, every shard processes a
different microbatch each tick, so total work matches the unsharded scan
while T-memory per chip drops n-fold (the point of sequence parallelism:
lattices too long for one chip's HBM).

Per-sample NLL extraction: sample b's final cell lives on shard
floor((input_length[b]-1)/T_shard); every shard computes its local candidate
and a ``psum`` combines them.

Also here: :func:`seq_sharded_greedy_decode` — greedy CTC decode on
frame-sharded logits, exchanging the boundary frame label between neighbor
shards via ``ppermute`` so cross-boundary repeats collapse correctly
(BASELINE.json's "decode state exchanged via collectives").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ctc_tpu.losses.blank import (
    blank_alpha_init,
    blank_emissions_and_skip,
    make_blank_step,
)
from ctc_tpu.ops.emissions import binary_ce_emissions
from ctc_tpu.ops.lattice_xla import make_noblank_step
from ctc_tpu.ops.logspace import NEG_SENTINEL

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

SEQ_AXIS = "seq"


def _run_pipeline(em, run_shard, init_boundary, n, k, seq_axis,
                  num_microbatches=None, b_axis: int = 1):
    """The shard-local carry-passing pipeline over m microbatches.

    ``em`` are this shard's emissions with the batch on axis ``b_axis``
    (``[t_s, B, L]`` for the XLA scan path, ``[t_s, L, B]`` for the Pallas
    kernel path); ``run_shard(b0, em_mb, boundary) -> (boundary_out,
    final_mb)`` runs one microbatch's T-slice (an XLA ``lax.scan`` of the
    shared lattice step, or the boundary-init Pallas kernel op);
    ``init_boundary [B/m, W]`` is the boundary-row carry shape/dtype seed.
    Returns the psum-combined per-sample ``final [B]``.

    ``num_microbatches`` (m, default n) is an independent knob: the
    pipeline runs m + n - 1 ticks for m ticks of useful work per shard, so
    the fill/drain bubble is (n-1)/(m+n-1) — raise m above the shard count
    to amortize it (m=n: ~47% idle at n=8; m=4n: ~16%).
    """
    t_shard = em.shape[0]
    batch = em.shape[b_axis]
    m_count = num_microbatches or n
    assert batch % m_count == 0, (
        f"batch {batch} not divisible by num_microbatches {m_count}"
    )
    mb = batch // m_count
    boundary = init_boundary
    finals = jnp.zeros((batch,), em.dtype)
    mb_shape = list(em.shape)
    mb_shape[b_axis] = mb

    def pipeline_step(s, carry):
        boundary, finals = carry
        m = s - k  # microbatch index at this shard this tick
        active = (m >= 0) & (m < m_count)
        m_idx = jnp.clip(m, 0, m_count - 1)
        start = [0, 0, 0]
        start[b_axis] = m_idx * mb
        em_mb = jax.lax.dynamic_slice(em, start, mb_shape)
        boundary_out, final_mb = run_shard(m_idx * mb, em_mb, boundary)
        finals = jax.lax.dynamic_update_slice(
            finals,
            jax.lax.dynamic_slice(finals, (m_idx * mb,), (mb,))
            + jnp.where(active, final_mb, 0.0),
            (m_idx * mb,),
        )
        # hand the boundary alpha to the next shard (ring; shard n-1's
        # send wraps to 0 where it is ignored)
        boundary = jax.lax.ppermute(
            jnp.where(active, boundary_out, boundary),
            seq_axis,
            [(i, (i + 1) % n) for i in range(n)],
        )
        return boundary, finals

    _, finals = jax.lax.fori_loop(
        0, m_count + n - 1, pipeline_step, (boundary, finals)
    )
    # each sample's final was accumulated on exactly one shard
    return jax.lax.psum(finals, seq_axis)


def make_seq_sharded_lattice_nll(mesh, *, mode: str = "noblank",
                                 seq_axis: str = SEQ_AXIS, blank: int = 0,
                                 num_microbatches: int | None = None,
                                 batch_axis: str | None = None,
                                 implementation: str | None = None,
                                 interpret: bool = False):
    """Build a jitted sequence-sharded per-sample NLL ``[B]``.

    The per-shard scan reuses the same step functions as the unsharded
    losses (:func:`ctc_tpu.ops.lattice_xla.make_noblank_step`,
    :func:`ctc_tpu.losses.blank.make_blank_step`) — only the pipeline wiring
    (boundary ppermute, microbatching, psum extraction) lives here.

    Modes / signatures of the returned function (leading axis T is split
    over ``seq_axis``; batch must be divisible by ``num_microbatches``,
    default = the axis size):

    * ``'noblank'``: ``(emissions [T, B, L], input_lengths, target_lengths)``
    * ``'noblank_logits'``: ``(logits [T, B, C], paths [B, L] int,
      input_lengths, target_lengths)`` — NoBlankCTC semantics with the
      log-softmax emission gather computed *shard-locally* (the Trainer's
      long-T path; /root/reference/NoBlankCTC.py:129-141).
    * ``'binary'``:  ``(logits [T, B, C], paths [B, L, C], input_lengths,
      target_lengths)`` — BCE emissions (NoBlankBinaryCTC semantics,
      /root/reference/NoBlankBinaryCTC.py:108-121) are computed
      shard-locally from the logits shard via
      :func:`ctc_tpu.ops.emissions.binary_ce_emissions`.
    * ``'blank'``:   ``(logits [T, B, C], targets [B, L], input_lengths,
      target_lengths)`` — torch.nn.CTCLoss semantics; log-softmax and the
      emission gather are shard-local.

    ``num_microbatches`` ≥ the shard count shrinks the pipeline
    fill/drain bubble from (n-1)/(2n-1) to (n-1)/(m+n-1).

    ``batch_axis``: additionally shard B over that mesh axis — the
    data×seq composition (SURVEY.md §2.5 item 1 × §5.7): each data-shard
    group runs its own T-pipeline over its local batch; the boundary
    ppermute and final psum ride the ``seq`` axis only, so nothing crosses
    the data axis inside the loss.  The returned per-sample NLL is the
    global ``[B]`` (out_specs concatenate the data shards).

    ``implementation='pallas'``: the per-shard, per-microbatch T-slices run
    the boundary-init Pallas kernel pair
    (:func:`ctc_tpu.ops.lattice_pallas.noblank_shard_lattice_pallas` —
    docs/ROOFLINE.md "future work" design, now built) instead of XLA
    scans, for the blank-free modes; the blank mode uses its own boundary
    kernels (:mod:`ctc_tpu.ops.blank_lattice_pallas`).  Default (None) =
    Pallas on TPU backends like the unsharded losses.
    """
    n = mesh.shape[seq_axis]
    ba = batch_axis
    if implementation is None:
        from ctc_tpu.ops.dispatch import _default_implementation

        implementation = _default_implementation()
    use_pallas = implementation == "pallas"

    def _xla_pipeline(em, make_mb_step, init_alpha, k, mb):
        """XLA scan per microbatch T-slice (the `'xla'` per-shard path)."""
        t_shard = em.shape[0]
        t_global = k * t_shard + jnp.arange(t_shard)

        def run_shard(b0, em_mb, boundary):
            alpha0 = jnp.where(k == 0, init_alpha, boundary)
            (alpha_out, final_mb), _ = jax.lax.scan(
                make_mb_step(b0),
                (alpha0, jnp.zeros((mb,), em.dtype)),
                (t_global, em_mb),
            )
            return alpha_out, final_mb

        return _run_pipeline(em, run_shard, init_alpha, n, k, seq_axis,
                             num_microbatches, b_axis=1)

    def _noblank_local(em, input_lengths, target_lengths):
        k = jax.lax.axis_index(seq_axis)
        t_shard, batch, max_l = em.shape
        mb = batch // (num_microbatches or n)
        outside = jnp.arange(max_l)[None, :] >= target_lengths[:, None]
        last_pos = jnp.clip(target_lengths - 1, 0, max_l - 1)[:, None]

        def make_mb_step(b0):
            return make_noblank_step(
                jax.lax.dynamic_slice(outside, (b0, 0), (mb, max_l)),
                jax.lax.dynamic_slice(input_lengths, (b0,), (mb,)),
                jax.lax.dynamic_slice(last_pos, (b0, 0), (mb, 1)),
            )

        init_alpha = (
            jnp.full((mb, max_l), NEG_SENTINEL, em.dtype).at[:, 0].set(0.0)
        )
        final = _xla_pipeline(em, make_mb_step, init_alpha, k, mb)
        return -final

    def _noblank_local_pallas(em_tlb, input_lengths, target_lengths):
        """Kernel-backed pipeline: ``em_tlb [t_s, W, B]`` with the label
        axis already at the kernel's compute width W (sublane-padded by
        the tlb emission builders)."""
        from ctc_tpu.ops.lattice_pallas import noblank_shard_lattice_pallas

        k = jax.lax.axis_index(seq_axis)
        t_shard, l_pad, batch = em_tlb.shape
        mb = batch // (num_microbatches or n)
        t_offset = k * t_shard
        std_init = (
            jnp.full((mb, l_pad), NEG_SENTINEL, em_tlb.dtype)
            .at[:, 0].set(0.0)
        )
        sent_row = jnp.full((mb, l_pad), NEG_SENTINEL, em_tlb.dtype)

        def run_shard(b0, em_mb, boundary):
            # shard 0's first step: standard init + no-advance sentinel;
            # interior shards: both rows = the incoming boundary alpha
            stay0 = jnp.where(k == 0, std_init, boundary)
            adv0 = jnp.where(k == 0, sent_row, boundary)
            inl = jax.lax.dynamic_slice(
                input_lengths, (b0,), (mb,)
            ) - t_offset
            tgt = jax.lax.dynamic_slice(target_lengths, (b0,), (mb,))
            final_mb, boundary_out = noblank_shard_lattice_pallas(
                em_mb, stay0, adv0, inl, tgt, "tlb", interpret, None
            )
            return boundary_out, final_mb

        final = _run_pipeline(em_tlb, run_shard, std_init, n, k, seq_axis,
                              num_microbatches, b_axis=2)
        return -final

    _em_layout = "tlb" if use_pallas else "tbl"
    _lattice = _noblank_local_pallas if use_pallas else _noblank_local

    def _binary_local(logits, paths, input_lengths, target_lengths):
        em = binary_ce_emissions(logits, paths, layout=_em_layout)
        return _lattice(em, input_lengths, target_lengths)

    def _noblank_logits_local(logits, paths, input_lengths, target_lengths):
        from ctc_tpu.ops.emissions import gather_log_softmax_emissions

        em = gather_log_softmax_emissions(logits, paths, layout=_em_layout)
        return _lattice(em, input_lengths, target_lengths)

    def _noblank_em_local(em, input_lengths, target_lengths):
        # raw [T/n, B, L] emissions in: the pallas path transposes and
        # sublane-pads shard-locally (the product modes above emit tlb
        # directly from their gathers — no transpose there)
        if use_pallas:
            from ctc_tpu.ops.lattice_pallas import boundary_width

            l_pad = boundary_width(em.shape[2], "tlb")
            em = jnp.pad(
                jnp.transpose(em, (0, 2, 1)),
                ((0, 0), (0, l_pad - em.shape[2]), (0, 0)),
            )
        return _lattice(em, input_lengths, target_lengths)

    def _blank_local(logits, targets, input_lengths, target_lengths):
        k = jax.lax.axis_index(seq_axis)
        # raw-logits gather + shard-local row-lse (log-probs never built)
        em, skip_ok = blank_emissions_and_skip(logits, targets, blank,
                                               normalize=True)
        t_shard, batch, s_len = em.shape
        mb = batch // (num_microbatches or n)
        valid = (
            jnp.arange(s_len)[None, :] < (2 * target_lengths + 1)[:, None]
        )

        def make_mb_step(b0):
            return make_blank_step(
                jax.lax.dynamic_slice(skip_ok, (b0, 0), (mb, s_len)),
                jax.lax.dynamic_slice(valid, (b0, 0), (mb, s_len)),
                jax.lax.dynamic_slice(input_lengths, (b0,), (mb,)),
                jax.lax.dynamic_slice(target_lengths, (b0,), (mb,)),
            )

        init_alpha = blank_alpha_init(mb, s_len, em.dtype)
        final = _xla_pipeline(em, make_mb_step, init_alpha, k, mb)
        return -final

    def _blank_local_pallas(logits, targets, input_lengths, target_lengths):
        from ctc_tpu.ops.blank_lattice_pallas import (
            blank_shard_lattice_pallas,
        )
        from ctc_tpu.ops.logspace import BLANK_NEG

        k = jax.lax.axis_index(seq_axis)
        # one-hot MXU einsum emission in the kernel's tlb layout,
        # sublane-padded with inert blank slots (losses/blank.py)
        em, skip_ok = blank_emissions_and_skip(
            logits, targets, blank, pad_multiple=8, layout="tlb",
            normalize=True,
        )
        t_shard, s_pad, batch = em.shape
        mb = batch // (num_microbatches or n)
        t_offset = k * t_shard
        virt_init = blank_alpha_init(mb, s_pad, em.dtype)
        sent_row = jnp.full((mb, s_pad), BLANK_NEG, em.dtype)

        def run_shard(b0, em_mb, boundary):
            init0 = jnp.where(k == 0, virt_init, boundary)
            skip0 = jnp.where(k == 0, sent_row, boundary)
            skip_mb = jax.lax.dynamic_slice(skip_ok, (b0, 0), (mb, s_pad))
            inl = jax.lax.dynamic_slice(
                input_lengths, (b0,), (mb,)
            ) - t_offset
            tgt = jax.lax.dynamic_slice(target_lengths, (b0,), (mb,))
            final_mb, boundary_out = blank_shard_lattice_pallas(
                em_mb, init0, skip0, skip_mb, inl, tgt, "tlb", interpret,
                None,
            )
            return boundary_out, final_mb

        final = _run_pipeline(em, run_shard, virt_init, n, k, seq_axis,
                              num_microbatches, b_axis=2)
        return -final

    if use_pallas:
        _blank_local = _blank_local_pallas  # noqa: F811

    if mode == "noblank":
        local, in_specs = _noblank_em_local, (P(seq_axis, ba), P(ba), P(ba))
    elif mode == "noblank_logits":
        local, in_specs = (
            _noblank_logits_local, (P(seq_axis, ba), P(ba), P(ba), P(ba))
        )
    elif mode == "binary":
        local, in_specs = _binary_local, (P(seq_axis, ba), P(ba), P(ba), P(ba))
    elif mode == "blank":
        local, in_specs = _blank_local, (P(seq_axis, ba), P(ba), P(ba), P(ba))
    else:
        raise ValueError(f"unknown seq-sharded lattice mode {mode!r}")

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(ba),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_seq_sharded_loss(mesh, loss_kind: str, *, seq_axis: str = SEQ_AXIS,
                          num_microbatches: int | None = None,
                          blank: int = 0, batch_axis: str | None = None):
    """A drop-in replacement for the :mod:`ctc_tpu.losses` entry points with
    the lattice's T axis pipelined over the mesh's ``seq`` axis — the
    Trainer's long-T option (``--seq-parallel``).

    Same call signature and reference reductions as the unsharded losses:
    noblank / binary = batch mean (/root/reference/NoBlankCTC.py:139-141),
    blank = torch 'mean' (per-sample NLL / target_length, batch mean).
    Gradients flow through the pipeline (ppermute/psum transposes);
    parity-tested against the unsharded custom_vjp in
    tests/test_seq_lattice.py.
    """
    mode = {"noblank": "noblank_logits", "binary": "binary",
            "blank": "blank"}[loss_kind]
    nll_fns: dict = {}

    def _nll_fn(implementation, interpret):
        key = (implementation, interpret)
        if key not in nll_fns:
            nll_fns[key] = make_seq_sharded_lattice_nll(
                mesh, mode=mode, seq_axis=seq_axis,
                num_microbatches=num_microbatches, blank=blank,
                batch_axis=batch_axis, implementation=implementation,
                interpret=interpret,
            )
        return nll_fns[key]

    def loss_fn(logits, paths, input_lengths, target_lengths,
                implementation=None, interpret=False):
        # per-shard T-slices honor the kernel selection exactly like the
        # unsharded losses: 'pallas' (default on TPU) = the boundary-init
        # kernel pipeline, 'xla' = lax.scan shards
        nll = _nll_fn(implementation, interpret)(
            logits, paths, input_lengths, target_lengths
        )
        if loss_kind == "blank":
            return jnp.mean(
                nll / jnp.maximum(target_lengths, 1).astype(nll.dtype)
            )
        return jnp.mean(nll)

    return loss_fn


def make_seq_sharded_greedy_decode(mesh, *, seq_axis: str = SEQ_AXIS,
                                   blank: int = 0):
    """Greedy decode with T-sharded logits ``[T, B, C]``.

    Each shard argmaxes its frames locally, receives the previous shard's
    last frame label via ``ppermute``, marks cross-boundary repeats, and an
    ``all_gather`` over the seq axis reassembles the keep-mask; the final
    compaction runs identically (replicated) on every shard.
    Returns ``(decoded [B, T] -1-padded, lengths [B])``.
    """
    n = mesh.shape[seq_axis]

    def local(logits, input_lengths):
        t_shard, batch, _ = logits.shape
        k = jax.lax.axis_index(seq_axis)
        frame = jnp.argmax(logits, axis=2).T.astype(jnp.int32)  # [B, T/n]
        # boundary label = previous shard's LAST frame label
        prev_boundary = jax.lax.ppermute(
            frame[:, -1], seq_axis, [(i, (i + 1) % n) for i in range(n)]
        )
        prev_boundary = jnp.where(k == 0, -1, prev_boundary)
        prev = jnp.concatenate([prev_boundary[:, None], frame[:, :-1]], axis=1)
        t_global = k * t_shard + jnp.arange(t_shard)[None, :]
        keep = (
            (t_global < input_lengths[:, None])
            & (frame != blank)
            & (frame != prev)
        )
        # reassemble full sequences on every shard
        frame_all = jax.lax.all_gather(frame, seq_axis, axis=1, tiled=True)
        keep_all = jax.lax.all_gather(keep, seq_axis, axis=1, tiled=True)
        max_t = frame_all.shape[1]
        pos = jnp.cumsum(keep_all, axis=1) - 1
        scatter_pos = jnp.where(keep_all, pos, max_t)
        out = jnp.full((batch, max_t), -1, jnp.int32)
        out = jax.vmap(lambda o, p, l: o.at[p].set(l, mode="drop"))(
            out, scatter_pos, frame_all
        )
        return out, jnp.sum(keep_all, axis=1)

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(seq_axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_time_axis(x, mesh, *, seq_axis: str = SEQ_AXIS):
    """Place ``[T, ...]`` with the leading axis split over the seq axis."""
    return jax.device_put(x, NamedSharding(mesh, P(seq_axis)))
