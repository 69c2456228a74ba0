"""Blank-free CTC losses (the reference repo's core contribution).

Semantics match /root/reference/NoBlankCTC.py and
/root/reference/NoBlankBinaryCTC.py: a stay/advance-only lattice over
(time, label-path position), per-sample loss ``-alpha[T_b-1, L_b-1]``, batch
mean.  Emissions are log-softmax gathers (single-label) or negative mean
binary cross-entropies (multi-label).

The heavy DP runs through :func:`ctc_tpu.ops.lattice_xla.noblank_lattice_nll`
(analytic VJP) or, on TPU, the Pallas wavefront kernel with the same
interface (``implementation='pallas'``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ctc_tpu.ops.emissions import (
    gather_log_softmax_emissions,
    binary_ce_emissions,
)
from ctc_tpu.ops import dispatch


def _reduce(per_sample: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(per_sample)
    if reduction == "sum":
        return jnp.sum(per_sample)
    if reduction == "none":
        return per_sample
    raise ValueError(f"unknown reduction {reduction!r}")


def no_blank_ctc_loss(
    logits: jnp.ndarray,
    paths: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    *,
    reduction: str = "mean",
    implementation: str | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blank-free CTC NLL over single-label class-index paths.

    Equivalent to ``NoBlankCTC()(logits, paths, input_lengths,
    target_lengths)`` in the reference (/root/reference/NoBlankCTC.py:129-141),
    which applies LogSoftmax over classes and takes the batch mean.

    Args:
      logits: ``[T, B, C]`` unnormalized class scores.
      paths: ``[B, L]`` int label paths (may be ``-1``-padded).
      input_lengths: ``[B]`` valid time steps per sample.
      target_lengths: ``[B]`` valid path length per sample.
      reduction: ``'mean'`` (reference default), ``'sum'`` or ``'none'``.
      implementation: ``'xla'``, ``'pallas'`` or None (auto by backend).
      interpret: run the Pallas kernel in interpret mode (CPU testing).
    """
    layout = dispatch.preferred_layout(implementation)
    emissions = gather_log_softmax_emissions(logits, paths, layout=layout)
    nll = dispatch.lattice_nll(
        emissions, input_lengths, target_lengths,
        implementation=implementation, layout=layout, interpret=interpret,
    )
    return _reduce(nll, reduction)


def no_blank_binary_ctc_loss(
    logits: jnp.ndarray,
    paths: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    *,
    reduction: str = "mean",
    implementation: str | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-label blank-free CTC NLL with BCE emissions.

    Equivalent to ``NoBlankBinaryCTC()`` in the reference
    (/root/reference/NoBlankBinaryCTC.py:139-151): sigmoid over classes, the
    emission at lattice cell (t, l) is the negative mean binary cross-entropy
    between the per-class probabilities at time t and the multi-hot path row l.

    Args:
      logits: ``[T, B, C]`` unnormalized per-class scores.
      paths: ``[B, L, C]`` float multi-hot label paths.
      input_lengths / target_lengths: ``[B]`` valid lengths.
    """
    layout = dispatch.preferred_layout(implementation)
    emissions = binary_ce_emissions(logits, paths, layout=layout)
    nll = dispatch.lattice_nll(
        emissions, input_lengths, target_lengths,
        implementation=implementation, layout=layout, interpret=interpret,
    )
    return _reduce(nll, reduction)
