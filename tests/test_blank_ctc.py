"""Standard blank-CTC parity vs torch.nn.CTCLoss (BASELINE.json config 3)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ctc_tpu import losses


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
def test_blank_ctc_parity_vs_torch(rng, reduction):
    T, B, C, L = 64, 6, 20, 12
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    # labels 1..C-1 (0 is blank), repeats included to exercise skip rules
    targets = rng.integers(1, C, size=(B, L)).astype(np.int32)
    targets[:, ::3] = targets[:, 1::3][:, : targets[:, ::3].shape[1]]  # force repeats
    in_len = rng.integers(L * 2 + 1, T + 1, size=B)
    tgt_len = rng.integers(1, L + 1, size=B)
    in_len[0], tgt_len[0] = T, L

    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = torch.nn.CTCLoss(blank=0, reduction=reduction)(
        torch.nn.functional.log_softmax(t_logits, dim=2),
        torch.tensor(targets),
        torch.tensor(in_len),
        torch.tensor(tgt_len),
    )
    t_scalar = t_loss.sum() if reduction == "none" else t_loss
    t_scalar.backward()

    def jax_loss(lg):
        out = losses.ctc_loss(
            lg,
            jnp.asarray(targets),
            jnp.asarray(in_len),
            jnp.asarray(tgt_len),
            blank=0,
            reduction=reduction,
        )
        return jnp.sum(out) if reduction == "none" else out

    j_val = losses.ctc_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(in_len),
        jnp.asarray(tgt_len), blank=0, reduction=reduction,
    )
    j_grad = jax.grad(jax_loss)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(j_val), t_loss.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_grad), t_logits.grad.numpy(), rtol=2e-3, atol=2e-5
    )


def test_blank_ctc_single_frame(rng):
    """input_length == 1 with a single label: loss = -log p(label at t=0)."""
    T, B, C = 4, 2, 5
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    targets = np.array([[3], [1]], dtype=np.int32)
    in_len = np.array([1, 1])
    tgt_len = np.array([1, 1])
    got = np.asarray(
        losses.ctc_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(in_len),
            jnp.asarray(tgt_len), reduction="none",
        )
    )
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=2))
    want = -np.array([logp[0, 0, 3], logp[0, 1, 1]])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
