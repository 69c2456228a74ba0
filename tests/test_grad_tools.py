"""Gradient-manipulation ops vs the genuine reference autograd Functions."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ctc_tpu.ops.grad_tools import (
    BalanceState,
    balance_labels,
    block_gradient,
    equalize_grad_norm,
    update_balance,
    verbose_gradients,
)


@pytest.mark.usefixtures("torch_cpu_patch")
def test_balance_labels_parity(rng):
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.layers.BalanceLabels import BalanceLabels

    B, C = 6, 5
    x = rng.standard_normal((B, C)).astype(np.float32)
    targets = (rng.random((B, C)) < 0.4).astype(np.float32)
    cot = rng.standard_normal((B, C)).astype(np.float32)

    ref = BalanceLabels()
    tx = torch.tensor(x, requires_grad=True)
    out = ref(tx, torch.tensor(targets))
    out.backward(torch.tensor(cot))
    want = tx.grad.numpy()

    state = update_balance(BalanceState.create(C), jnp.asarray(targets))
    _, vjp = jax.vjp(
        lambda a: balance_labels(a, jnp.asarray(targets), state),
        jnp.asarray(x),
    )
    got = np.asarray(vjp(jnp.asarray(cot))[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_equalize_grad_norm(rng):
    a = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))

    def f(a, b):
        x, y = equalize_grad_norm(a, b)
        return jnp.sum(x) + jnp.sum(100.0 * y)

    ga, gb = jax.grad(f, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(
        np.linalg.norm(ga), np.linalg.norm(gb), rtol=1e-5
    )


def test_verbose_and_block(rng, capfd):
    x = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))
    g = jax.grad(lambda a: jnp.sum(verbose_gradients(a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), rtol=1e-6)

    g0 = jax.grad(lambda a: jnp.sum(block_gradient(a) * a))(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(x), rtol=1e-6)
