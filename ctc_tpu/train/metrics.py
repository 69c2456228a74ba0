"""Metrics: the reference's top-k / DTW-style transition accuracy family,
vectorized (jnp + lax.scan instead of the reference's triple python loops).

Function map (reference /root/reference/train.py):

* :func:`topk_accuracy`            == ``accuracy_s``      (train.py:41-56)
* :func:`multilabel_topk_accuracy` == ``accuracy``        (train.py:59-78)
* :func:`transition_recall`        == ``recall_time``     (train.py:82-107)
* :func:`transition_accuracy`      == ``accuracy_time``   (train.py:111-136)
* :func:`sequence_accuracy`        == ``accuracy_s_time`` (train.py:139-155)
* :func:`future_accuracy`          == ``accuracy_future`` (train.py:159-182)

Reference quirks kept for parity (documented, not endorsed): percentages are
``100 * (#hits summed over the first k prediction rows) / denominator``, so
top-5 values may exceed 100; ``accuracy_future`` divides by
``count[:k+1].sum()`` where ``k`` is the top-k *value* (train.py:181).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class AverageMeter:
    """Running value/average meter (reference train.py:15-31)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def _topk_indices(output: jnp.ndarray, maxk: int) -> jnp.ndarray:
    """``[..., C] -> [..., maxk]`` indices of the top-k scores."""
    _, idx = jax.lax.top_k(output, maxk)
    return idx


def topk_accuracy(output, target, topk=(1, 5)):
    """Single-label top-k accuracy over a batch.

    Args:
      output: ``[B, C]`` scores.
      target: ``[B]`` int class ids.

    Returns:
      (percentages tuple, ``[B]`` float top-1 correctness vector) — mirroring
      the reference's ``accuracy_s`` return shape.
    """
    maxk = max(topk)
    batch = target.shape[0]
    pred = _topk_indices(output, maxk)  # [B, maxk]
    correct = (pred == target[:, None]).astype(jnp.float32)  # [B, maxk]
    res = tuple(
        jnp.sum(correct[:, :k]) * (100.0 / batch) for k in topk
    )
    return res, correct[:, 0]


def multilabel_topk_accuracy(output, target, topk=(1, 5)):
    """Multi-label precision@k: a prediction row hit counts if ``target > 0.5``
    at the predicted class (reference ``accuracy``, train.py:59-78).

    Args:
      output: ``[B, C]`` scores;  target: ``[B, C]`` multi-hot.
    """
    maxk = max(topk)
    batch = target.shape[0]
    pred = _topk_indices(output, maxk)  # [B, maxk]
    hit = jnp.take_along_axis(target, pred, axis=1) > 0.5  # [B, maxk]
    correct = hit.astype(jnp.float32)
    res = tuple(jnp.sum(correct[:, :k]) * (100.0 / batch) for k in topk)
    return res, correct[:, 0]


def _transition_scan(pred_row, target, valid_len, collect_per_t: bool,
                     j_limit=None):
    """Shared DTW-style matcher for one top-k row of one sample.

    Walks predictions left-to-right; at step j searches the label path for the
    first position ``t >= current_id`` (within ``valid_len``) whose multi-hot
    row contains the predicted class, marks a hit and moves ``current_id`` to
    ``t``.  Mirrors reference train.py:93-103 / 122-130.  ``j_limit``
    restricts which prediction columns participate (the reference's
    ``recall_time`` walks only the first ``trans`` columns, train.py:99).
    """
    path_len = target.shape[0]
    positions = jnp.arange(path_len)

    def step(current_id, inp):
        j, p = inp
        ok = (
            (positions >= current_id)
            & (positions < valid_len)
            & (target[:, p] > 0.5)
        )
        if j_limit is not None:
            ok = ok & (j < j_limit)
        any_hit = jnp.any(ok)
        t_hit = jnp.argmax(ok)  # first True
        new_id = jnp.where(any_hit, t_hit, current_id)
        return new_id, (any_hit, t_hit)

    _, (hits, t_hits) = jax.lax.scan(
        step, jnp.int32(0), (jnp.arange(pred_row.shape[0]), pred_row)
    )
    if collect_per_t:
        # recall flavor: mark which label positions were ever matched
        per_t = jnp.zeros((path_len,), jnp.float32)
        per_t = per_t.at[jnp.where(hits, t_hits, path_len)].add(1.0, mode="drop")
        return jnp.minimum(per_t, 1.0)
    return hits.astype(jnp.float32)


def transition_accuracy(output, target, valid_len, topk=(1, 5)):
    """Reference ``accuracy_time``: per-timestep DTW-matched accuracy.

    Args:
      output: ``[T, C]`` per-timestep scores for ONE sample.
      target: ``[Lmax, C]`` multi-hot label path.
      valid_len: scalar — true path length.

    Returns (percentages tuple, ``[T]`` top-1 hit vector).
    """
    maxk = max(topk)
    temporal = output.shape[0]
    pred = _topk_indices(output, maxk).T  # [maxk, T]
    hits = jax.vmap(
        lambda row: _transition_scan(row, target, valid_len, False)
    )(pred)  # [maxk, T]
    res = tuple(jnp.sum(hits[:k]) * (100.0 / temporal) for k in topk)
    return res, hits[0]


def transition_recall(output, target, valid_len, topk=(1, 5)):
    """Reference ``recall_time``: fraction of label path positions matched."""
    maxk = max(topk)
    pred = _topk_indices(output, maxk).T  # [maxk, T]
    per_t = jax.vmap(
        lambda row: _transition_scan(row, target, valid_len, True,
                                     j_limit=valid_len)
    )(pred)  # [maxk, Lmax]
    denom = jnp.maximum(valid_len, 1).astype(jnp.float32)
    res = tuple(jnp.sum(per_t[:k]) * 100.0 / denom for k in topk)
    return res, per_t[0]


def sequence_accuracy(output, target, topk=(1, 5)):
    """Reference ``accuracy_s_time``: single future label vs every timestep.

    Args: output ``[T, C]``; target scalar int class.
    """
    maxk = max(topk)
    temporal = output.shape[0]
    pred = _topk_indices(output, maxk)  # [T, maxk]
    correct = (pred == target).astype(jnp.float32)
    res = tuple(jnp.sum(correct[:, :k]) * (100.0 / temporal) for k in topk)
    return res, correct[:, 0]


def future_accuracy(output, target, topk=(1, 5)):
    """Reference ``accuracy_future``: multi-hot future target vs all timesteps,
    normalized by the number of hit rows (min 1; reference train.py:159-182
    including its ``count[:k+1]`` slice quirk).
    """
    maxk = max(topk)
    pred = _topk_indices(output, maxk).T  # [maxk, T]
    correct = (jnp.take_along_axis(
        jnp.broadcast_to(target, (maxk, target.shape[0])), pred, axis=1
    ) > 0.5).astype(jnp.float32)  # [maxk, T]
    count = jnp.maximum(jnp.sum(correct, axis=1), 1.0)  # [maxk]
    res = tuple(
        jnp.sum(correct[:k]) * 100.0 / jnp.sum(count[: k + 1]) for k in topk
    )
    return res, correct[0]
