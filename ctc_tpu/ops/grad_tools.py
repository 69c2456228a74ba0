"""Gradient-manipulation ops — TPU-native equivalents of the reference's
custom autograd Functions (/root/reference/models/layers/, SURVEY.md §2 #27):

* :func:`balance_labels`      == BalanceLabels/ScaleGrad (BalanceLabels.py:11-54)
* :func:`verbose_gradients`   == VerboseGradients (VerboseGradients.py:15-25)
* :func:`equalize_grad_norm`  == EqualizeGradNorm (EqualizeGradNorm.py:15-28)
* :func:`block_gradient`      == BlockGradient (== jax.lax.stop_gradient)

All are identity in the forward pass and act on cotangents in the backward
pass via ``jax.custom_vjp``.  The running pos/neg statistics of
BalanceLabels live in an explicit state pytree (functional, jit-friendly)
instead of module attributes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- balance


class BalanceState(NamedTuple):
    """Running per-class positive/negative counts."""

    pos: jnp.ndarray  # [C]
    neg: jnp.ndarray  # [C]

    @classmethod
    def create(cls, num_classes: int):
        return cls(jnp.zeros((num_classes,)), jnp.zeros((num_classes,)))


def update_balance(state: BalanceState, targets: jnp.ndarray) -> BalanceState:
    """Accumulate multi-hot ``[B, C]`` targets into the running counts."""
    pos = state.pos + jnp.sum(targets > 0.5, axis=0)
    neg = state.neg + jnp.sum(targets <= 0.5, axis=0)
    return BalanceState(pos, neg)


@jax.custom_vjp
def balance_labels(x, targets, state):
    """Identity forward; backward scales each element's gradient so positive
    and negative examples contribute equally per class (the reference's
    ScaleGrad: w = total/(2*pos) for positives, total/(2*neg) for negatives).
    """
    return x


def _balance_fwd(x, targets, state):
    return x, (targets, state)


def _balance_bwd(res, g):
    targets, state = res
    total = state.pos + state.neg
    w_pos = total / jnp.maximum(2.0 * state.pos, 1.0)
    w_neg = total / jnp.maximum(2.0 * state.neg, 1.0)
    weights = jnp.where(targets > 0.5, w_pos[None, :], w_neg[None, :])
    return g * weights, None, None


balance_labels.defvjp(_balance_fwd, _balance_bwd)


# ---------------------------------------------------------------- verbose


@jax.custom_vjp
def verbose_gradients(*xs):
    """Identity forward; prints each cotangent's norm during backward
    (device-side jax.debug.print — works under jit)."""
    return xs if len(xs) > 1 else xs[0]


def _verbose_fwd(*xs):
    return (xs if len(xs) > 1 else xs[0]), len(xs)


def _verbose_bwd(n, g):
    gs = g if isinstance(g, tuple) else (g,)
    for i, gi in enumerate(gs):
        jax.debug.print(
            "verbose_gradients: input {i} grad norm {n}",
            i=i,
            n=jnp.linalg.norm(jnp.ravel(gi)),
        )
    return gs


verbose_gradients.defvjp(_verbose_fwd, _verbose_bwd)


# ---------------------------------------------------------------- equalize


@jax.custom_vjp
def equalize_grad_norm(*xs):
    """Identity forward; backward rescales every input's gradient to the
    norm of the FIRST input's gradient (EqualizeGradNorm.py:22-28)."""
    return xs


def _equalize_fwd(*xs):
    return xs, None


def _equalize_bwd(_, gs):
    ref_norm = jnp.linalg.norm(jnp.ravel(gs[0]))
    out = []
    for gi in gs:
        n = jnp.linalg.norm(jnp.ravel(gi))
        out.append(jnp.where(n > 0, gi * (ref_norm / jnp.maximum(n, 1e-12)), gi))
    return tuple(out)


equalize_grad_norm.defvjp(_equalize_fwd, _equalize_bwd)


# ---------------------------------------------------------------- block

block_gradient = jax.lax.stop_gradient
