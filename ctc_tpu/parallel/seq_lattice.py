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

from ctc_tpu.ops.logspace import NEG_SENTINEL

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

SEQ_AXIS = "seq"


def _local_scan(em, alpha0, outside, t_offset, input_lengths, last_pos):
    """Scan a local T-shard; returns (alpha_final, per-sample final gather)."""
    batch = em.shape[1]

    def step(carry, inp):
        alpha_prev, final = carry
        t_local, em_t = inp
        t_global = t_local + t_offset
        shifted = jnp.concatenate(
            [jnp.full((batch, 1), NEG_SENTINEL, em.dtype), alpha_prev[:, :-1]],
            axis=1,
        )
        advance = jnp.where(t_global > 0, shifted, NEG_SENTINEL)
        lse = jnp.logaddexp(alpha_prev, advance)
        lse = jnp.where(outside, NEG_SENTINEL, lse)
        alpha_t = lse + em_t
        gathered = jnp.take_along_axis(alpha_t, last_pos, axis=1)[:, 0]
        final = jnp.where(t_global == input_lengths - 1, gathered, final)
        return (alpha_t, final), None

    (alpha_out, final), _ = jax.lax.scan(
        step,
        (alpha0, jnp.zeros((batch,), em.dtype)),
        (jnp.arange(em.shape[0]), em),
    )
    return alpha_out, final


def make_seq_sharded_lattice_nll(mesh, *, seq_axis: str = SEQ_AXIS):
    """Build a jitted seq-sharded NLL: emissions ``[T, B, L]`` with T split
    over ``seq_axis``; batch must be divisible by the axis size."""
    n = mesh.shape[seq_axis]

    def local(em, input_lengths, target_lengths):
        # em: [T/n, B, L] local shard
        k = jax.lax.axis_index(seq_axis)
        t_shard, batch, max_l = em.shape
        mb = batch // n  # microbatch size
        outside = (
            jnp.arange(max_l)[None, :] >= target_lengths[:, None]
        )
        last_pos = jnp.clip(target_lengths - 1, 0, max_l - 1)[:, None]
        t_offset = k * t_shard

        init_alpha = jnp.full((mb, max_l), NEG_SENTINEL, em.dtype).at[:, 0].set(0.0)
        boundary = init_alpha  # alpha entering this shard for current mb
        finals = jnp.zeros((batch,), em.dtype)

        def pipeline_step(s, carry):
            boundary, finals = carry
            m = s - k  # microbatch index at this shard this tick
            active = (m >= 0) & (m < n)
            m_idx = jnp.clip(m, 0, n - 1)
            em_mb = jax.lax.dynamic_slice(
                em, (0, m_idx * mb, 0), (t_shard, mb, max_l)
            )
            outside_mb = jax.lax.dynamic_slice(
                outside, (m_idx * mb, 0), (mb, max_l)
            )
            last_mb = jax.lax.dynamic_slice(last_pos, (m_idx * mb, 0), (mb, 1))
            in_len_mb = jax.lax.dynamic_slice(
                input_lengths, (m_idx * mb,), (mb,)
            )
            alpha0 = jnp.where(k == 0, init_alpha, boundary)
            alpha_out, final_mb = _local_scan(
                em_mb, alpha0, outside_mb, t_offset, in_len_mb, last_mb
            )
            finals = jax.lax.dynamic_update_slice(
                finals,
                jnp.where(
                    active,
                    jax.lax.dynamic_slice(finals, (m_idx * mb,), (mb,))
                    + final_mb,
                    jax.lax.dynamic_slice(finals, (m_idx * mb,), (mb,)),
                ),
                (m_idx * mb,),
            )
            # hand the boundary alpha to the next shard (ring; shard n-1's
            # send wraps to 0 where it is ignored)
            boundary = jax.lax.ppermute(
                jnp.where(active, alpha_out, boundary),
                seq_axis,
                [(i, (i + 1) % n) for i in range(n)],
            )
            return boundary, finals

        _, finals = jax.lax.fori_loop(
            0, 2 * n - 1, pipeline_step, (boundary, finals)
        )
        # each sample's final was accumulated on exactly one shard
        finals = jax.lax.psum(finals, seq_axis)
        return -finals

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(seq_axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


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
