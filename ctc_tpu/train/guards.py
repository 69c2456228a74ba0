"""Failure detection / training-health guards (SURVEY.md §5.3 — the reference
has none; the framework ships them as optax transforms).

* :func:`skip_nonfinite_updates` — drops any update containing NaN/Inf
  (keeping params/optimizer state intact) and counts skipped steps; the
  idiomatic replacement for crashing mid-run or silently poisoning params.
* :func:`log_grad_norms` — device-side global-gradient-norm logging every k
  steps (the wired-in equivalent of the reference's unwired VerboseGradients,
  models/layers/VerboseGradients.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SkipState(NamedTuple):
    skipped: jnp.ndarray  # total non-finite updates dropped
    inner: optax.OptState


def skip_nonfinite_updates(
    inner: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Wrap ``inner``; non-finite updates become zeros (step skipped)."""

    def init(params):
        return SkipState(jnp.zeros((), jnp.int32), inner.init(params))

    def update(updates, state, params=None):
        finite = jnp.all(
            jnp.stack(
                [jnp.all(jnp.isfinite(u)) for u in jax.tree_util.tree_leaves(updates)]
            )
        )
        new_updates, new_inner = inner.update(updates, state.inner, params)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, new_updates)
        out = jax.tree_util.tree_map(
            lambda n, z: jnp.where(finite, n, z), new_updates, zeros
        )
        # on skip, keep the previous optimizer state (no moment pollution)
        kept_inner = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old)
            if hasattr(new, "shape") and getattr(new, "shape", None) == getattr(old, "shape", None)
            else new,
            new_inner,
            state.inner,
        )
        return out, SkipState(
            state.skipped + jnp.where(finite, 0, 1), kept_inner
        )

    return optax.GradientTransformation(init, update)


def log_grad_norms(every: int = 100) -> optax.GradientTransformation:
    """Identity transform that debug-prints the global grad norm every
    ``every`` updates (works under jit)."""

    def init(params):
        del params
        return jnp.zeros((), jnp.int32)

    def update(updates, count, params=None):
        del params
        norm = optax.global_norm(updates)
        jax.lax.cond(
            count % every == 0,
            lambda: jax.debug.print(
                "step {c}: global grad norm {n}", c=count, n=norm
            ),
            lambda: None,
        )
        return updates, count + 1

    return optax.GradientTransformation(init, update)
