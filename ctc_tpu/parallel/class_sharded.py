"""Class-axis (model-parallel) sharding for the multi-label binary CTC.

The 157 per-class binary lattices of NoBlankBinaryCTC are independent until
their BCE emission scores are averaged over classes
(/root/reference/NoBlankBinaryCTC.py:112).  Sharding the class axis over a
``model`` mesh axis therefore splits the heavy emission contraction
(``einsum('blc,tbc->tbl')`` — the dominant FLOPs at C=157) across chips, with
ONE ``lax.psum`` of the [T, B, L] partial emissions; the tiny lattice DP then
runs replicated.  Gradients flow back through the psum to each shard's local
class slice (SURVEY.md §2.5 item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ctc_tpu.ops import dispatch
from ctc_tpu.ops.logspace import clamped_log_sigmoid_pair

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

MODEL_AXIS = "model"


def make_class_sharded_binary_nll(
    mesh, num_classes: int, *, model_axis: str = MODEL_AXIS,
    batch_axis: str | None = None,
    implementation=None, reduction: str = "mean",
):
    """Build a jitted NoBlankBinaryCTC loss with the class axis sharded.

    Inputs: ``logits [T, B, C]`` and ``paths [B, L, C]`` with C split over
    ``model_axis``.  C may be zero-padded to a multiple of the axis size:
    pad classes are masked out by their global index (a pad class would
    otherwise add log(1/2) to every cell's ``base`` term).

    ``batch_axis``: additionally shard B over that mesh axis — the
    data×model composition (SURVEY.md §2.5 items 1-2): each device holds a
    ``[T, B/d, C/m]`` tile, the emission psum rides the ``model`` axis only,
    and the mean/sum reduction is pmean/psum-combined over ``batch_axis``.
    """
    ba = batch_axis

    def local(logits, paths, input_lengths, target_lengths):
        c_shard = logits.shape[2]
        k = jax.lax.axis_index(model_axis)
        global_c = k * c_shard + jnp.arange(c_shard)
        valid = (global_c < num_classes).astype(logits.dtype)  # [C_shard]
        log_p, log_1mp = clamped_log_sigmoid_pair(logits)
        pos = jnp.einsum(
            "blc,tbc->tbl", paths, (log_p - log_1mp) * valid[None, None, :],
            preferred_element_type=jnp.float32,
        )
        base = jnp.sum(log_1mp * valid[None, None, :], axis=2)  # [T, B]
        partial = pos + base[:, :, None]
        em = jax.lax.psum(partial, model_axis) / num_classes
        nll = dispatch.lattice_nll(
            em, input_lengths, target_lengths, implementation=implementation
        )
        if reduction == "mean":  # equal shard sizes: pmean of means = mean
            val = jnp.mean(nll)
            return jax.lax.pmean(val, ba) if ba else val
        if reduction == "sum":
            val = jnp.sum(nll)
            return jax.lax.psum(val, ba) if ba else val
        return nll

    out_specs = P(ba) if (reduction == "none" and ba) else P()
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, ba, model_axis), P(ba, None, model_axis),
                  P(ba), P(ba)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_class_sharded_binary_loss(
    mesh, *, model_axis: str = MODEL_AXIS, batch_axis: str | None = None,
):
    """A drop-in binary-loss replacement for :mod:`ctc_tpu.losses` entry
    points (same signature the Trainer's ``loss_fn`` hook expects) with the
    class axis sharded over ``model_axis`` — and, with ``batch_axis``, the
    batch simultaneously sharded over a ``data`` axis of the same mesh
    (the composed data×model train step).  Pads C to a multiple of the
    model-axis size; pad classes are masked by global index.
    """
    n = mesh.shape[model_axis]

    def loss_fn(logits, paths, input_lengths, target_lengths,
                implementation=None, interpret=False):
        del interpret
        c = logits.shape[2]
        nll_fn = make_class_sharded_binary_nll(
            mesh, num_classes=c, model_axis=model_axis,
            batch_axis=batch_axis, implementation=implementation,
            reduction="mean",
        )
        pad = (-c) % n
        if pad:  # C=157 need not divide the axis; pads are masked
            logits = jnp.pad(logits, ((0, 0), (0, 0), (0, pad)))
            paths = jnp.pad(paths, ((0, 0), (0, 0), (0, pad)))
        return nll_fn(logits, paths, input_lengths, target_lengths)

    return loss_fn


def shard_class_axis(x, mesh, *, model_axis: str = MODEL_AXIS):
    """Place an array with its LAST axis split over the model axis."""
    spec = [None] * (x.ndim - 1) + [model_axis]
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
