"""Metric-family parity vs the genuine reference implementations
(/root/reference/train.py:41-182)."""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ctc_tpu.train.metrics import (
    AverageMeter,
    future_accuracy,
    multilabel_topk_accuracy,
    sequence_accuracy,
    topk_accuracy,
    transition_accuracy,
    transition_recall,
)


@pytest.fixture(scope="module")
def ref_train():
    for name in ("matplotlib", "matplotlib.pyplot"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # the reference's .view(-1) on transposed (non-contiguous) tensors
    # crashes under modern torch; fall back to reshape (same values)
    orig_view = torch.Tensor.view

    def safe_view(self, *shape):
        try:
            return orig_view(self, *shape)
        except RuntimeError:
            return self.reshape(*shape)

    torch.Tensor.view = safe_view
    import importlib

    return importlib.import_module("train")


def test_topk_accuracy_parity(rng, ref_train):
    B, C = 16, 12
    output = rng.standard_normal((B, C)).astype(np.float32)
    target = rng.integers(0, C, size=B)
    r1, r5, corr = ref_train.accuracy_s(
        torch.tensor(output), torch.tensor(target), topk=(1, 5)
    )
    (g1, g5), gcorr = topk_accuracy(
        jnp.asarray(output), jnp.asarray(target), topk=(1, 5)
    )
    np.testing.assert_allclose(float(g1), float(r1), rtol=1e-6)
    np.testing.assert_allclose(float(g5), float(r5), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(gcorr), corr.numpy())


def test_multilabel_topk_parity(rng, ref_train):
    B, C = 10, 15
    output = rng.standard_normal((B, C)).astype(np.float32)
    target = (rng.random((B, C)) < 0.3).astype(np.float32)
    r1, r5, _ = ref_train.accuracy(
        torch.tensor(output), torch.tensor(target), topk=(1, 5)
    )
    (g1, g5), _ = multilabel_topk_accuracy(
        jnp.asarray(output), jnp.asarray(target), topk=(1, 5)
    )
    np.testing.assert_allclose(float(g1), float(r1), rtol=1e-6)
    np.testing.assert_allclose(float(g5), float(r5), rtol=1e-6)


def test_transition_accuracy_parity(rng, ref_train):
    T, C, L = 6, 9, 4
    for trial in range(5):
        output = rng.standard_normal((T, C)).astype(np.float32)
        target = (rng.random((L, C)) < 0.3).astype(np.float32)
        valid = int(rng.integers(1, L + 1))
        r1, r5, rcorr = ref_train.accuracy_time(
            torch.tensor(output), torch.tensor(target), valid, topk=(1, 5)
        )
        (g1, g5), gcorr = transition_accuracy(
            jnp.asarray(output), jnp.asarray(target), valid, topk=(1, 5)
        )
        np.testing.assert_allclose(float(g1), float(r1), rtol=1e-6, err_msg=str(trial))
        np.testing.assert_allclose(float(g5), float(r5), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(gcorr), rcorr.numpy())


def test_transition_recall_parity(rng, ref_train):
    T, C, L = 6, 9, 5
    for trial in range(5):
        output = rng.standard_normal((T, C)).astype(np.float32)
        target = (rng.random((L, C)) < 0.3).astype(np.float32)
        valid = int(rng.integers(1, L + 1))
        r1, r5, _ = ref_train.recall_time(
            torch.tensor(output), torch.tensor(target), valid, topk=(1, 5)
        )
        (g1, g5), _ = transition_recall(
            jnp.asarray(output), jnp.asarray(target), valid, topk=(1, 5)
        )
        np.testing.assert_allclose(float(g1), float(r1), rtol=1e-6, err_msg=str(trial))
        np.testing.assert_allclose(float(g5), float(r5), rtol=1e-6)


def test_sequence_accuracy_parity(rng, ref_train):
    T, C = 7, 11
    output = rng.standard_normal((T, C)).astype(np.float32)
    target = int(rng.integers(0, C))
    r1, r5, _ = ref_train.accuracy_s_time(
        torch.tensor(output), torch.tensor(target), topk=(1, 5)
    )
    (g1, g5), _ = sequence_accuracy(jnp.asarray(output), target, topk=(1, 5))
    np.testing.assert_allclose(float(g1), float(r1), rtol=1e-6)
    np.testing.assert_allclose(float(g5), float(r5), rtol=1e-6)


def test_future_accuracy_parity(rng, ref_train):
    T, C = 7, 11
    for trial in range(5):
        output = rng.standard_normal((T, C)).astype(np.float32)
        target = (rng.random(C) < 0.3).astype(np.float32)
        r1, r5, _ = ref_train.accuracy_future(
            torch.tensor(output), torch.tensor(target), topk=(1, 5)
        )
        (g1, g5), _ = future_accuracy(
            jnp.asarray(output), jnp.asarray(target), topk=(1, 5)
        )
        np.testing.assert_allclose(float(g1), float(r1), rtol=1e-6, err_msg=str(trial))
        np.testing.assert_allclose(float(g5), float(r5), rtol=1e-6)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, 2)
    m.update(4.0)
    assert m.val == 4.0
    np.testing.assert_allclose(m.avg, (2.0 * 2 + 4.0) / 3)
