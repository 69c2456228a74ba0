"""Greedy (best-path) CTC decoding.

The standard argmax -> collapse-repeats -> drop-blank decode (the parity
partner of torch.nn.CTCLoss per BASELINE.json config 3; the reference itself
never decodes — its prediction is the last timestep's argmax,
/root/reference/train.py:434).  Fully jittable with static shapes: outputs are
``-1``-padded ``[B, T]`` plus lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def collapse_repeats(labels: jnp.ndarray, lengths: jnp.ndarray, blank: int = 0):
    """Collapse consecutive repeats then remove blanks.

    Args:
      labels: ``[B, T]`` int frame labels.
      lengths: ``[B]`` valid frame counts.
      blank: blank id.

    Returns:
      ``(decoded [B, T] -1-padded, out_lengths [B])``.
    """
    batch, max_t = labels.shape
    t_idx = jnp.arange(max_t)[None, :]
    valid = t_idx < lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((batch, 1), -1, labels.dtype), labels[:, :-1]], axis=1
    )
    keep = valid & (labels != blank) & (labels != prev)
    # stable compaction: position of each kept element in the output
    pos = jnp.cumsum(keep, axis=1) - 1
    out = jnp.full((batch, max_t), -1, labels.dtype)
    scatter_pos = jnp.where(keep, pos, max_t)  # dropped -> out-of-bounds
    out = jax.vmap(
        lambda o, p, l: o.at[p].set(l, mode="drop")
    )(out, scatter_pos, labels)
    return out, jnp.sum(keep, axis=1)


def greedy_decode(
    logits: jnp.ndarray, input_lengths: jnp.ndarray, *, blank: int = 0
):
    """Best-path decode of ``[T, B, C]`` logits.

    Returns ``(decoded [B, T] -1-padded, lengths [B], frame_labels [B, T])``.
    """
    frame = jnp.argmax(logits, axis=2).T.astype(jnp.int32)  # [B, T]
    decoded, lengths = collapse_repeats(frame, input_lengths, blank)
    return decoded, lengths, frame
