"""Deterministic seeding (reference main.py:21-25 seeds python/numpy/torch)."""

from __future__ import annotations

import random

import numpy as np

import jax


def seed_everything(seed: int) -> jax.Array:
    """Seed python + numpy and return a JAX PRNGKey (JAX itself is pure —
    the key is the only device-side state)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
