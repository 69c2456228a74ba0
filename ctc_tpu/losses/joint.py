"""Joint (object, verb) two-head training — the reference factory's shape.

The reference instantiates BOTH blank-free losses (`ctc_loss = NoBlankCTC()`,
`bctc_loss = NoBlankBinaryCTC()`, /root/reference/models/__init__.py:82-86)
and its loaders thread independent object and verb targets through
``Trainer.train`` (/root/reference/train.py:366-399: ``o_target [B, L, o]``
multi-hot + ``v_target [B, L]`` with separate ``o_time``/``v_time``
lengths) — but its live code only ever trains the verb head.  Here the
joint mode is a product path: ONE model head of width ``v_class + o_class``
trained with both lattices off shared features in one step, which is what
gives the (o, v) relation-tagging eval
(:func:`ctc_tpu.eval.video.video_relation_eval`,
/root/reference/utils/__init__.py:61-113) a live consumer.

Batch convention (self-describing from shapes, so every trainer/step path
works unchanged):

* ``paths [B, L, 1 + o_class]`` — column 0 is the verb class-index path
  (float-cast; ``-1`` padding allowed), columns 1: the multi-hot object
  path.
* ``target_lengths [B, 2]`` — ``(v_time, o_time)`` per sample.
* ``logits [T, B, v_class + o_class]`` — verb slice first.
"""

from __future__ import annotations

import jax.numpy as jnp

from ctc_tpu.losses.noblank import (
    no_blank_binary_ctc_loss,
    no_blank_ctc_loss,
)


def split_joint_logits(logits, paths):
    """``(v_logits, o_logits)`` from a joint head, widths inferred from the
    packed paths (``o_class = paths.shape[-1] - 1``)."""
    o_class = paths.shape[-1] - 1
    v_class = logits.shape[-1] - o_class
    return logits[..., :v_class], logits[..., v_class:]


def unpack_joint_paths(paths):
    """``(v_paths [B, L] int32, o_paths [B, L, o_class])``."""
    return jnp.round(paths[..., 0]).astype(jnp.int32), paths[..., 1:]


def joint_ov_ctc_loss(
    logits: jnp.ndarray,
    paths: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    *,
    implementation: str | None = None,
    interpret: bool = False,
    object_weight: float = 1.0,
) -> jnp.ndarray:
    """Verb NoBlankCTC + object NoBlankBinaryCTC off one joint head.

    The weighted sum of the two batch-mean losses — each term identical
    to its standalone registry loss on the corresponding logits slice, so
    the joint step is exactly "train both heads at once".

    Args:
      logits: ``[T, B, v_class + o_class]``.
      paths: ``[B, L, 1 + o_class]`` packed (see module docstring).
      input_lengths: ``[B]``.
      target_lengths: ``[B, 2]`` — ``(v_time, o_time)``.
      object_weight: scale on the object term (``--joint-object-weight``).
        The binary NLL's emissions are MEAN BCE over the o_class classes
        (torch semantics), so its magnitude — and the shared trunk's
        gradient share — runs ~1/o_class of the verb NLL's; raise this to
        rebalance when the object head undertrains.
    """
    v_logits, o_logits = split_joint_logits(logits, paths)
    v_paths, o_paths = unpack_joint_paths(paths)
    kw = dict(implementation=implementation, interpret=interpret)
    return no_blank_ctc_loss(
        v_logits, v_paths, input_lengths, target_lengths[:, 0], **kw
    ) + object_weight * no_blank_binary_ctc_loss(
        o_logits, o_paths, input_lengths, target_lengths[:, 1], **kw
    )
