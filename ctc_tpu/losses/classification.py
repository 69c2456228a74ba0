"""Classification losses: the reference's custom CrossEntropy plus the stock
cross-entropy / BCE-with-logits losses it instantiates.

* :func:`multilabel_cross_entropy` reproduces /root/reference/CrossEntropy.py:17-32
  exactly — including its quirk of applying a *second* log-sum-exp to the
  already-softmaxed probabilities (the reference's label-smoothing experiment).
* :func:`cross_entropy` == torch.nn.CrossEntropyLoss
  (/root/reference/models/__init__.py:85).
* :func:`bce_with_logits` == torch.nn.BCEWithLogitsLoss
  (/root/reference/models/__init__.py:86).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def multilabel_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, *, reduction: str = "mean"
) -> jnp.ndarray:
    """The reference's hand-written multi-label CE.

    ``loss[b] = log(sum_n exp(softmax(logits)[b, n]))
                - sum_{n: targets[b, n] == 1} softmax(logits)[b, n]``

    Args:
      logits: ``[B, N]`` unnormalized scores.
      targets: ``[B, N]`` multi-hot (0/1) targets.
    """
    probs = jax.nn.softmax(logits, axis=1)
    lse = jax.scipy.special.logsumexp(probs, axis=1)
    hits = jnp.sum(jnp.where(targets == 1, probs, 0.0), axis=1)
    loss = lse - hits
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, *, reduction: str = "mean"
) -> jnp.ndarray:
    """Single-label softmax cross-entropy over int class targets ``[B]``."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray, *, reduction: str = "mean"
) -> jnp.ndarray:
    """Numerically-stable sigmoid binary cross-entropy (multi-hot targets)."""
    # max(x, 0) - x*t + log(1 + exp(-|x|)) — the standard stable form.
    loss = (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
