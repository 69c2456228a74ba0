"""Emission-score builders for the CTC-family lattices.

An "emission" is the per-lattice-cell log-score ``em[t, b, l]`` that gets added
to the stay/advance transition log-sum-exp at each step of the dynamic program.
The two blank-free modes of the reference differ only in how emissions are
computed:

* ``NoBlankCTC``   — ``em[t,b,l] = log_softmax(logits)[t, b, path[b, l]]``
  (/root/reference/NoBlankCTC.py:96-102,136).
* ``NoBlankBinaryCTC`` — ``em[t,b,l] = -BCE(sigmoid(logits)[t,b,:], path[b,l,:])``,
  the negative *mean* binary cross-entropy over all C classes
  (/root/reference/NoBlankBinaryCTC.py:108-116,146).

Both are built here as dense XLA ops (gathers / MXU einsums) so the lattice
scan kernel itself is mode-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctc_tpu.ops.logspace import clamped_log_sigmoid_pair

_SUBLANE = 8  # TPU f32 sublane multiple (lattice kernel's tlb label unit)


def _pad_label_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Pad axis 0 (label-path positions) up to the sublane multiple."""
    l = x.shape[0]
    pad = (-l) % _SUBLANE
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


def gather_log_softmax_emissions(
    logits: jnp.ndarray, paths: jnp.ndarray, *, layout: str = "tbl"
) -> jnp.ndarray:
    """Softmax-classification emissions for the blank-free lattice.

    Args:
      logits: ``[T, B, C]`` unnormalized class scores.
      paths: ``[B, L]`` int class-index label paths.  Padded entries may be
        ``-1``; they are wrapped modulo ``C`` (mimicking python negative
        indexing in the reference, /root/reference/NoBlankCTC.py:102) — padded
        cells are masked out of the DP so the value never matters.
      layout: ``'tbl'`` -> ``[T, B, L]``; ``'tlb'`` -> ``[T, L, B]`` (the
        native layout of the TPU lattice kernel: label positions on
        sublanes, batch on lanes — produced directly by the gather, no
        transpose copy).

    Returns:
      Float emissions ``log_softmax(logits)[t, b, paths[b, l]]`` in the
      requested layout.

    The log-probs tensor is never materialized: the gather reads RAW
    logits and the per-(t, b) row-logsumexp is subtracted once
    (``em = logits[path] - lse``, identical math to the log_softmax
    gather).  That skips a full [T, B, C] write+read in the forward and
    the log_softmax VJP pass in the backward — d(loss)/d(logits) is still
    exactly ``scatter(g) - softmax * rowsum(g)``, now via the logsumexp
    VJP (~4 fewer HBM passes over [T, B, C] per step at C >> L).
    """
    num_classes = logits.shape[-1]
    lse = jax.nn.logsumexp(logits, axis=2)  # [T, B]
    idx = jnp.mod(paths, num_classes)  # [B, L]
    if layout == "tlb":
        # The label axis is padded to the kernel's sublane multiple HERE —
        # the gather produces the padded width directly (cost ∝ output
        # rows), so the kernel reads aligned blocks and skips its per-step
        # in-VMEM widen copy; padded rows are outside-masked in the DP and
        # their gradient is exactly zero, so the scatter-add back into
        # logits is a no-op for them (and their lse term sums zero g).
        idx_p = _pad_label_rows(idx.T)  # [L_pad, B]
        # em[t, l, b] = logits[t, b, idx_p[l, b]] - lse[t, b]
        raw = jnp.take_along_axis(
            logits[:, None, :, :],  # [T, 1, B, C]
            idx_p[None, :, :, None],  # [1, L_pad, B, 1]
            axis=3,
        )[..., 0]
        return raw - lse[:, None, :]
    # Gather along the class axis: em[t, b, l] = logits[t, b, idx[b, l]].
    raw = jnp.take_along_axis(
        logits[:, :, None, :],  # [T, B, 1, C]
        idx[None, :, :, None],  # [1, B, L, 1]
        axis=3,
    )[..., 0]
    return raw - lse[:, :, None]


def binary_ce_emissions(
    logits: jnp.ndarray, paths: jnp.ndarray, *, layout: str = "tbl"
) -> jnp.ndarray:
    """Multi-label (binary cross-entropy) emissions.

    ``em[t,b,l] = (1/C) * sum_c [ path[b,l,c] * log p[t,b,c]
                                  + (1 - path[b,l,c]) * log (1 - p[t,b,c]) ]``
    with ``p = sigmoid(logits)`` and each log term clamped at ``-100``
    (torch.nn.BCELoss semantics, /root/reference/NoBlankBinaryCTC.py:112).

    Rewritten as one MXU contraction:
      ``em = einsum(path, log_p - log_1mp) / C + mean_c(log_1mp)``.

    Args:
      logits: ``[T, B, C]`` unnormalized per-class scores.
      paths: ``[B, L, C]`` float multi-hot label paths.
      layout: ``'tbl'`` -> ``[T, B, L]``; ``'tlb'`` -> ``[T, L, B]`` (the
        TPU kernel's native layout — the einsum emits it directly).

    Returns:
      Float emissions in the requested layout.
    """
    num_classes = logits.shape[-1]
    log_p, log_1mp = clamped_log_sigmoid_pair(logits)  # each [T, B, C]
    diff = log_p - log_1mp
    base = jnp.sum(log_1mp, axis=2)  # [T, B]
    # MXU-friendly batched contraction over the class axis.
    if layout == "tlb":
        # pad the path axis to the kernel's sublane multiple (see the
        # gather builder): zero path rows contract to zero, the base
        # broadcast fills them, and they are outside-masked in the DP.
        paths_p = jnp.transpose(
            _pad_label_rows(jnp.transpose(paths, (1, 0, 2))), (1, 0, 2)
        )
        pos = jnp.einsum(
            "blc,tbc->tlb", paths_p, diff, preferred_element_type=jnp.float32
        )
        return (pos + base[:, None, :]) / num_classes
    pos = jnp.einsum(
        "blc,tbc->tbl", paths, diff, preferred_element_type=jnp.float32
    )
    return (pos + base[:, :, None]) / num_classes
