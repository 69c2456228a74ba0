"""Standard blank-CTC loss (the torch.nn.CTCLoss capability of the reference,
used at /root/reference/models/layers/AsyncTFCriterion.py:198 and
/root/reference/test.py:514).

Classic Graves CTC over the blank-expanded label sequence
``z = [blank, l1, blank, l2, ..., lL, blank]`` (length S = 2L+1) with
stay / advance / skip transitions, where skip is allowed into non-blank
positions whose label differs from the one two slots back.  Two
implementations of the O(T*S) DP, same math (loss and grads match
torch.nn.CTCLoss to float tolerance):

* ``'xla'`` — log-space ``lax.scan`` over time, differentiated by autodiff
  through the scan (CPU-runnable; the test oracle path).
* ``'pallas'`` — the TPU wavefront kernel pair in
  :mod:`ctc_tpu.ops.blank_lattice_pallas` (alpha chunked through VMEM,
  analytic backward).  Default on TPU backends.

The emission build stays in XLA in both cases, working on RAW logits:
``em[t, b, s] = logits[t, b, z[b, s]] - logsumexp_c(logits[t, b])`` — the
[T, B, C] log-probs tensor is never materialized (the row-lse is [T, B]).
For ``layout='tlb'`` (the Pallas default) the build is a one-hot MXU
einsum whose backward is another matmul; for ``'tbl'`` (the XLA scan
path) it is a gather whose backward is XLA's scatter-add.  Above a
one-hot-size threshold the tlb path falls back to gather+transpose (the
einsum's [B, S, C] one-hot scales linearly with vocabulary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctc_tpu.ops.logspace import BLANK_NEG as _NEG


def _expand_targets(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """``[B, L] -> [B, 2L+1]`` blank-interleaved label sequence."""
    batch, max_l = targets.shape
    z = jnp.full((batch, 2 * max_l + 1), blank, targets.dtype)
    return z.at[:, 1::2].set(targets)


def blank_emissions_and_skip(scores, targets, blank, *, pad_multiple=1,
                             layout="tbl", normalize=False):
    """Gathered emissions + skip mask over the blank-expanded sequence.

    Args:
      scores: ``[T, B, C]`` log-probabilities — or RAW logits with
        ``normalize=True``, in which case the per-(t, b) row-logsumexp is
        subtracted once after the gather/einsum (``em = scores[z] - lse``,
        identical math to gathering from log_softmax) so the [T, B, C]
        log-probs tensor is never materialized: ~4 fewer HBM passes per
        step at C >> S, both directions.
      targets: ``[B, L]`` int labels.
      pad_multiple: pad ``S`` up to a multiple of this (the TPU kernel's
        sublane unit, 8) with trailing *blank* slots — they can never feed
        the final cells (transitions only move to higher ``s``), their
        backward ``g`` is exactly zero, and the gather produces the padded
        width directly so the kernel reads aligned blocks.
      layout: ``'tbl'`` -> em ``[T, B, S]``; ``'tlb'`` -> ``[T, S, B]``
        (the kernel's native layout, produced by the gather directly — no
        transpose copy).

    Returns:
      ``(em, skip_ok [B, S])`` with ``S = 2L+1`` (padded up):
      emissions ``em[t, b, s] = log_probs[t, b, z[b, s]]`` and the
      skip-transition permission mask (s odd, label differs from two slots
      back).  Shared by :func:`ctc_loss` and the sequence-sharded blank
      mode in :mod:`ctc_tpu.parallel.seq_lattice`.
    """
    batch = targets.shape[0]
    num_classes = scores.shape[2]
    z = _expand_targets(jnp.mod(targets, num_classes), blank)  # [B, S]
    pad = (-z.shape[1]) % pad_multiple
    if pad:
        z = jnp.pad(z, ((0, 0), (0, pad)), constant_values=blank)
    s_len = z.shape[1]
    z_prev2 = jnp.concatenate(
        [jnp.full((batch, 2), blank, z.dtype), z[:, :-2]], 1
    )
    s_idx = jnp.arange(s_len)[None, :]
    skip_ok = (s_idx >= 2) & (z != blank) & (z != z_prev2)  # [B, S]
    if layout == "tlb" and batch * s_len * num_classes * 4 <= 512 * 2**20:
        # em[t, s, b] = log_probs[t, b, z[b, s]] as a one-hot contraction:
        # the batched [T,C]x[C,S] matmul rides the MXU and — decisively —
        # its transpose in the backward pass is another matmul, where the
        # gather's backward is an XLA scatter-add into [T, B, C] (measured
        # 1.76x slower end-to-end on the chip, probe_blank_e2e.py).
        # Precision.HIGHEST keeps the f32 log-probs exact through the MXU's
        # bf16 passes (one-hot rows make every product a pass-through).
        # Gated on the one-hot's size (f32 [B, S, C]): at dictionary-scale
        # vocabularies (e.g. C=10k, B=256, S=201 -> ~2 GB) it falls through
        # to the gather below instead.
        onehot = jax.nn.one_hot(z, num_classes, dtype=scores.dtype)
        em = jnp.einsum(
            "tbc,bsc->tsb", scores, onehot,
            precision=jax.lax.Precision.HIGHEST,
        )  # [T, S, B]
    else:
        em = jnp.take_along_axis(
            scores[:, :, None, :], z[None, :, :, None], axis=3
        )[..., 0]  # [T, B, S]
        if layout == "tlb":
            em = jnp.transpose(em, (0, 2, 1))  # [T, S, B]
    if normalize:
        lse = jax.nn.logsumexp(scores, axis=2)  # [T, B]
        em = em - (lse[:, None, :] if layout == "tlb" else lse[:, :, None])
    return em, skip_ok


def make_blank_step(skip_ok, valid, input_lengths, target_lengths):
    """Build the per-timestep scan body of the blank-CTC alpha DP.

    Unified ``t >= 0`` formulation: the initial carry is the virtual
    ``alpha(-1)`` row (0 at s = 0, sentinel elsewhere) so that t == 0
    produces the torch initialization (em at s in {0, 1}); skip is gated
    off at t == 0.  ``carry = (alpha_prev [B, S], final [B])``,
    ``inp = (t_global, em_t [B, S])``.  Shared by :func:`ctc_loss` and the
    sequence-sharded blank mode.
    """
    s_len = skip_ok.shape[1]

    def gather_final(alpha_t):
        last_blank = jnp.take_along_axis(
            alpha_t, jnp.clip(2 * target_lengths, 0, s_len - 1)[:, None], 1
        )[:, 0]
        last_label = jnp.take_along_axis(
            alpha_t, jnp.clip(2 * target_lengths - 1, 0, s_len - 1)[:, None], 1
        )[:, 0]
        return jnp.where(
            target_lengths > 0, jnp.logaddexp(last_blank, last_label),
            last_blank,
        )

    def step(carry, inp):
        alpha_prev, final = carry
        t, em_t = inp
        batch = alpha_prev.shape[0]
        dtype = alpha_prev.dtype
        shift1 = jnp.concatenate(
            [jnp.full((batch, 1), _NEG, dtype), alpha_prev[:, :-1]], 1
        )
        shift2 = jnp.concatenate(
            [jnp.full((batch, 2), _NEG, dtype), alpha_prev[:, :-2]], 1
        )
        shift2 = jnp.where(jnp.logical_and(skip_ok, t > 0), shift2, _NEG)
        lse = jnp.logaddexp(jnp.logaddexp(alpha_prev, shift1), shift2)
        alpha_t = jnp.where(valid, lse, _NEG) + em_t
        final = jnp.where(t == input_lengths - 1, gather_final(alpha_t), final)
        return (alpha_t, final), None

    return step


def blank_alpha_init(batch, s_len, dtype=jnp.float32):
    """The virtual ``alpha(-1)`` carry row for :func:`make_blank_step`."""
    return jnp.full((batch, s_len), _NEG, dtype).at[:, 0].set(0.0)


def ctc_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    *,
    blank: int = 0,
    reduction: str = "mean",
    normalize: bool = True,
    implementation: str | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blank CTC NLL.

    Args:
      logits: ``[T, B, C]`` unnormalized scores (log_softmax applied inside,
        so pass raw logits — torch.nn.CTCLoss instead takes log-probs; pass
        ``normalize=False`` to feed log-probabilities directly).
      targets: ``[B, L]`` int labels (padding value irrelevant).
      input_lengths / target_lengths: ``[B]`` valid lengths.
      blank: blank class index (torch default 0).
      reduction: ``'mean'`` (torch semantics: per-sample loss divided by
        target length, then batch mean), ``'sum'`` or ``'none'``.
      implementation: ``'xla'`` (lax.scan) / ``'pallas'`` (TPU kernel) /
        ``None`` = Pallas on TPU backends, XLA elsewhere.
      interpret: run the Pallas kernel in interpret mode (CPU testing only).
    """
    max_t, batch, num_classes = logits.shape
    if implementation is None:
        from ctc_tpu.ops.dispatch import _default_implementation

        implementation = _default_implementation()
    if implementation == "pallas":
        try:
            from ctc_tpu.ops.blank_lattice_pallas import blank_lattice_nll_pallas

            # [T, S, B] built directly: label slots on sublanes (padded to
            # the sublane multiple with inert blank slots), batch on lanes
            # — aligned kernel blocks, no transpose copy.  RAW gathered
            # emissions go into the kernel; the log-softmax normalization
            # is applied as a FINAL per-sample correction instead of a
            # [T, S, B]-wide subtract: every lattice path accumulates
            # exactly one emission per timestep, so
            # ``nll = nll_raw + sum_{t<T_b} lse[t, b]`` — exact, and
            # measured ~3% faster e2e (probe_blank_lsecorr.py, 8/8 reps).
            em_tlb, skip_ok = blank_emissions_and_skip(
                logits, targets, blank, pad_multiple=8, layout="tlb",
                normalize=False,
            )
            nll = blank_lattice_nll_pallas(
                em_tlb,
                skip_ok,
                input_lengths,
                target_lengths,
                layout="tlb",
                interpret=interpret,
            )
            if normalize:
                lse = jax.nn.logsumexp(logits, axis=2)  # [T, B]
                tmask = (
                    jnp.arange(max_t)[:, None] < input_lengths[None, :]
                )
                nll = nll + jnp.sum(jnp.where(tmask, lse, 0.0), axis=0)
            return _reduce(nll, target_lengths, reduction)
        except Exception as e:  # pragma: no cover - exercised via monkeypatch
            # The remote Mosaic compiler can reject a kernel (e.g. VMEM
            # budget) at a new shape; degrade to the XLA scan instead of
            # crashing training (only catchable when ctc_loss runs outside
            # an enclosing jit — inside one, pass implementation='xla').
            import warnings

            warnings.warn(
                f"blank-CTC Pallas path failed ({type(e).__name__}: {e}); "
                "falling back to implementation='xla'",
                stacklevel=2,
            )

    em, skip_ok = blank_emissions_and_skip(logits, targets, blank,
                                           normalize=normalize)
    s_len = em.shape[2]
    # Valid lattice columns: s < 2 * target_length + 1.
    s_idx = jnp.arange(s_len)[None, :]
    valid = s_idx < (2 * target_lengths + 1)[:, None]  # [B, S]
    step = make_blank_step(skip_ok, valid, input_lengths, target_lengths)
    (_, final), _ = jax.lax.scan(
        step,
        (blank_alpha_init(batch, s_len, logits.dtype), jnp.zeros((batch,), logits.dtype)),
        (jnp.arange(max_t), em),
    )
    return _reduce(-final, target_lengths, reduction)


def _reduce(nll, target_lengths, reduction):
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(target_lengths, 1).astype(nll.dtype))
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "none":
        return nll
    raise ValueError(f"unknown reduction {reduction!r}")
