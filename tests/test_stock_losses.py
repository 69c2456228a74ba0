"""Stock losses vs their torch counterparts; dispatch defaults."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ctc_tpu import losses
from ctc_tpu.ops import dispatch


def test_cross_entropy_parity(rng):
    B, C = 12, 33
    logits = rng.standard_normal((B, C)).astype(np.float32)
    targets = rng.integers(0, C, size=B)
    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = torch.nn.CrossEntropyLoss()(t_logits, torch.tensor(targets))
    t_loss.backward()
    j_loss, j_grad = jax.value_and_grad(
        lambda lg: losses.cross_entropy(lg, jnp.asarray(targets))
    )(jnp.asarray(logits))
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(j_grad), t_logits.grad.numpy(), rtol=1e-5, atol=1e-7
    )


def test_bce_with_logits_parity(rng):
    B, C = 10, 38
    logits = rng.standard_normal((B, C)).astype(np.float32)
    targets = (rng.random((B, C)) < 0.3).astype(np.float32)
    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = torch.nn.BCEWithLogitsLoss()(t_logits, torch.tensor(targets))
    t_loss.backward()
    j_loss, j_grad = jax.value_and_grad(
        lambda lg: losses.bce_with_logits(lg, jnp.asarray(targets))
    )(jnp.asarray(logits))
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(j_grad), t_logits.grad.numpy(), rtol=1e-5, atol=1e-7
    )


def test_dispatch_defaults():
    assert dispatch._default_implementation() in ("xla", "pallas")
    # on the CPU test backend the default must be the XLA scan
    assert dispatch._default_implementation() == "xla"
    try:
        dispatch.lattice_nll(
            jnp.zeros((2, 1, 2)), jnp.ones((1,), jnp.int32),
            jnp.ones((1,), jnp.int32), implementation="bogus",
        )
        assert False
    except ValueError as e:
        assert "bogus" in str(e)
