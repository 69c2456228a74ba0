"""Loss + gradient parity against the GENUINE reference PyTorch modules.

Runs /root/reference/NoBlankCTC.py, NoBlankBinaryCTC.py and CrossEntropy.py
directly (``.cuda()`` patched to a no-op) at small shapes, and checks both the
fast torch oracle (tests/torch_oracle.py) and the JAX implementation against
them — loss values and d(loss)/d(logits).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ctc_tpu import losses

SMALL = dict(T=12, B=4, L=6, C=9)


def _lengths(rng, B, T, L):
    input_lengths = rng.integers(2, T + 1, size=B)
    target_lengths = rng.integers(1, L + 1, size=B)
    # a sample exercising the full lattice
    input_lengths[0] = T
    target_lengths[0] = L
    return input_lengths, target_lengths


def _jax_grad(fn, logits_np, *args):
    val, grad = jax.value_and_grad(fn)(jnp.asarray(logits_np), *args)
    return np.asarray(val), np.asarray(grad)


def _torch_grad(fn, logits_np, *args):
    logits = torch.tensor(logits_np, requires_grad=True)
    loss = fn(logits, *args)
    loss.backward()
    return loss.detach().numpy(), logits.grad.numpy()


@pytest.mark.usefixtures("torch_cpu_patch")
def test_noblank_ctc_parity_vs_reference(rng):
    from NoBlankCTC import NoBlankCTC  # genuine reference module

    T, B, L, C = SMALL["T"], SMALL["B"], SMALL["L"], SMALL["C"]
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    paths = rng.integers(0, C, size=(B, L)).astype(np.int32)
    in_len, tgt_len = _lengths(rng, B, T, L)
    # reference pads invalid path tail with -1 (charades_ctc_next_pred.py:683)
    for b in range(B):
        paths[b, tgt_len[b]:] = -1

    ref = NoBlankCTC()
    ref_loss, ref_grad = _torch_grad(
        lambda lg: ref(
            lg,
            torch.tensor(paths),
            torch.tensor(in_len),
            torch.tensor(tgt_len),
        ),
        logits,
    )

    from torch_oracle import noblank_ctc_loss as oracle

    orc_loss, orc_grad = _torch_grad(
        lambda lg: oracle(
            lg,
            torch.tensor(paths),
            torch.tensor(in_len),
            torch.tensor(tgt_len),
        ),
        logits,
    )
    np.testing.assert_allclose(orc_loss, ref_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(orc_grad, ref_grad, rtol=2e-3, atol=2e-5)

    jax_loss, jax_grad = _jax_grad(
        lambda lg: losses.no_blank_ctc_loss(
            lg,
            jnp.asarray(paths),
            jnp.asarray(in_len),
            jnp.asarray(tgt_len),
            implementation="xla",
        ),
        logits,
    )
    np.testing.assert_allclose(jax_loss, ref_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(jax_grad, ref_grad, rtol=2e-3, atol=2e-5)


@pytest.mark.usefixtures("torch_cpu_patch")
def test_noblank_binary_ctc_parity_vs_reference(rng):
    from NoBlankBinaryCTC import NoBlankBinaryCTC

    T, B, L, C = SMALL["T"], SMALL["B"], SMALL["L"], SMALL["C"]
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    paths = (rng.random((B, L, C)) < 0.2).astype(np.float32)
    in_len, tgt_len = _lengths(rng, B, T, L)

    ref = NoBlankBinaryCTC()
    ref_loss, ref_grad = _torch_grad(
        lambda lg: ref(
            lg,
            torch.tensor(paths),
            torch.tensor(in_len),
            torch.tensor(tgt_len),
        ),
        logits,
    )

    from torch_oracle import noblank_binary_ctc_loss as oracle

    orc_loss, orc_grad = _torch_grad(
        lambda lg: oracle(
            lg,
            torch.tensor(paths),
            torch.tensor(in_len),
            torch.tensor(tgt_len),
        ),
        logits,
    )
    np.testing.assert_allclose(orc_loss, ref_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(orc_grad, ref_grad, rtol=2e-3, atol=2e-5)

    jax_loss, jax_grad = _jax_grad(
        lambda lg: losses.no_blank_binary_ctc_loss(
            lg,
            jnp.asarray(paths),
            jnp.asarray(in_len),
            jnp.asarray(tgt_len),
            implementation="xla",
        ),
        logits,
    )
    np.testing.assert_allclose(jax_loss, ref_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(jax_grad, ref_grad, rtol=2e-3, atol=2e-5)


@pytest.mark.usefixtures("torch_cpu_patch")
def test_multilabel_cross_entropy_parity_vs_reference(rng):
    from CrossEntropy import CrossEntropy

    B, N = 6, 33
    logits = rng.standard_normal((B, N)).astype(np.float32)
    targets = (rng.random((B, N)) < 0.15).astype(np.float32)

    ref = CrossEntropy()
    ref_loss, ref_grad = _torch_grad(
        lambda lg: ref(lg, torch.tensor(targets)), logits
    )

    jax_loss, jax_grad = _jax_grad(
        lambda lg: losses.multilabel_cross_entropy(lg, jnp.asarray(targets)),
        logits,
    )
    np.testing.assert_allclose(jax_loss, ref_loss, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(jax_grad, ref_grad, rtol=2e-3, atol=2e-5)
