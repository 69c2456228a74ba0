"""Blank-CTC Pallas kernel parity (interpret mode on CPU).

Regression protection for the default TPU path of
:func:`ctc_tpu.losses.ctc_loss` (the torch.nn.CTCLoss capability,
/root/reference/models/layers/AsyncTFCriterion.py:198): the
stay/advance/skip wavefront kernels in
:mod:`ctc_tpu.ops.blank_lattice_pallas` vs the XLA lax.scan oracle and vs
genuine ``torch.nn.CTCLoss`` — loss and gradients, both layouts,
multi-chunk tiling, zero-length targets, repeated labels, and
input_lengths in {1, 2}.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ctc_tpu import losses
from ctc_tpu.losses.blank import _expand_targets
from ctc_tpu.ops.blank_lattice_pallas import blank_lattice_nll_pallas


def _loss_case(rng, T, B, C, L, repeats=False):
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    targets = rng.integers(1, C, size=(B, L)).astype(np.int32)
    if repeats:
        targets[:, 1::2] = targets[:, ::2][:, : targets[:, 1::2].shape[1]]
    in_len = rng.integers(2 * L + 1, T + 1, size=B)
    tgt_len = rng.integers(1, L + 1, size=B)
    in_len[0], tgt_len[0] = T, L
    return logits, targets, in_len, tgt_len


def _compare_impls(logits, targets, in_len, tgt_len, tiles=None):
    """loss+grad of ctc_loss(pallas, interpret) vs ctc_loss(xla)."""
    args = (jnp.asarray(targets), jnp.asarray(in_len), jnp.asarray(tgt_len))

    def via_xla(lg):
        return losses.ctc_loss(lg, *args, reduction="sum", implementation="xla")

    def via_pallas(lg):
        return losses.ctc_loss(
            lg, *args, reduction="sum", implementation="pallas", interpret=True
        )

    lg = jnp.asarray(logits)
    v_x, g_x = jax.value_and_grad(via_xla)(lg)
    v_p, g_p = jax.value_and_grad(via_pallas)(lg)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize(
    "T,B,C,L,repeats",
    [(16, 4, 8, 5, False), (64, 6, 20, 12, True), (37, 5, 11, 9, True)],
    ids=["small", "repeats", "odd-sizes"],
)
def test_blank_pallas_matches_xla(rng, T, B, C, L, repeats):
    _compare_impls(*_loss_case(rng, T, B, C, L, repeats=repeats))


@pytest.mark.parametrize("tiles", [(8, 8), (16, 8)], ids=["8x8", "16x8"])
@pytest.mark.parametrize("layout", ["tbl", "tlb"])
def test_blank_pallas_multichunk_tiles(rng, tiles, layout):
    """Force several time chunks per batch tile + batch/S padding, vs the
    XLA scan oracle, gradients through the full logits chain rule."""
    T, B, C, L = 28, 5, 9, 10  # S = 21, t_pad/chunk > 1
    logits, targets, in_len, tgt_len = _loss_case(rng, T, B, C, L, repeats=True)
    j_args = (jnp.asarray(targets), jnp.asarray(in_len), jnp.asarray(tgt_len))

    def via_xla(lg):
        return losses.ctc_loss(
            lg, *j_args, reduction="sum", implementation="xla"
        )

    def via_pallas(lg):
        em, skip_ok, args = _emissions(lg, targets, in_len, tgt_len)
        em_in = jnp.transpose(em, (0, 2, 1)) if layout == "tlb" else em
        return jnp.sum(
            blank_lattice_nll_pallas(
                em_in, skip_ok, *args, layout=layout, interpret=True,
                tiles=tiles,
            )
        )

    lg = jnp.asarray(logits)
    v_x, g_x = jax.value_and_grad(via_xla)(lg)
    v_p, g_p = jax.value_and_grad(via_pallas)(lg)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-3, atol=2e-5)


def _emissions(logits, targets, in_len, tgt_len):
    """Build the gathered [T, B, S] emissions + skip mask like losses.blank."""
    lg = jnp.asarray(logits)
    log_probs = jax.nn.log_softmax(lg, axis=2)
    z = _expand_targets(jnp.asarray(targets), 0)
    batch, s_len = z.shape
    z_prev2 = jnp.concatenate([jnp.zeros((batch, 2), z.dtype), z[:, :-2]], 1)
    s_idx = jnp.arange(s_len)[None, :]
    skip_ok = (s_idx >= 2) & (z != 0) & (z != z_prev2)
    em = jnp.take_along_axis(
        log_probs[:, :, None, :], z[None, :, :, None], axis=3
    )[..., 0]
    return em, skip_ok, (jnp.asarray(in_len), jnp.asarray(tgt_len))


@pytest.mark.parametrize("layout", ["tbl", "tlb"])
def test_blank_pallas_layouts_match_torch(rng, layout):
    """Direct kernel (both layouts) vs torch.nn.CTCLoss: loss + emission grad
    checked through the full ctc_loss chain rule."""
    T, B, C, L = 32, 4, 10, 7
    logits, targets, in_len, tgt_len = _loss_case(rng, T, B, C, L, repeats=True)

    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = torch.nn.CTCLoss(blank=0, reduction="sum")(
        torch.nn.functional.log_softmax(t_logits, dim=2),
        torch.tensor(targets),
        torch.tensor(in_len),
        torch.tensor(tgt_len),
    )
    t_loss.backward()

    em, skip_ok, args = _emissions(logits, targets, in_len, tgt_len)
    em_in = jnp.transpose(em, (0, 2, 1)) if layout == "tlb" else em

    def nll_sum(e):
        return jnp.sum(
            blank_lattice_nll_pallas(
                e, skip_ok, *args, layout=layout, interpret=True
            )
        )

    v_p = nll_sum(em_in)
    np.testing.assert_allclose(
        float(v_p), float(t_loss.detach()), rtol=1e-4, atol=1e-5
    )

    # grad parity vs torch through the full logits chain rule
    def full(lg):
        return losses.ctc_loss(
            lg,
            jnp.asarray(targets),
            *args,
            reduction="sum",
            implementation="pallas",
            interpret=True,
        )

    g = jax.grad(full)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g), t_logits.grad.numpy(), rtol=2e-3, atol=2e-5
    )


def test_blank_pallas_zero_target_length(rng):
    """target_length == 0: loss is -sum of blank log-probs (all-blank path);
    torch.nn.CTCLoss(reduction='none') handles this the same way."""
    T, B, C = 12, 3, 6
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    targets = rng.integers(1, C, size=(B, 4)).astype(np.int32)
    in_len = np.array([12, 7, 3])
    tgt_len = np.array([0, 2, 0])

    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = torch.nn.CTCLoss(blank=0, reduction="none")(
        torch.nn.functional.log_softmax(t_logits, dim=2),
        torch.tensor(targets),
        torch.tensor(in_len),
        torch.tensor(tgt_len),
    )
    t_loss.sum().backward()

    def via_pallas(lg, reduction):
        return losses.ctc_loss(
            lg,
            jnp.asarray(targets),
            jnp.asarray(in_len),
            jnp.asarray(tgt_len),
            reduction=reduction,
            implementation="pallas",
            interpret=True,
        )

    nll = via_pallas(jnp.asarray(logits), "none")
    np.testing.assert_allclose(
        np.asarray(nll), t_loss.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    g = jax.grad(lambda lg: jnp.sum(via_pallas(lg, "none")))(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g), t_logits.grad.numpy(), rtol=2e-3, atol=2e-5
    )


@pytest.mark.parametrize("in_len_val", [1, 2])
def test_blank_pallas_short_inputs(in_len_val):
    """input_lengths in {1, 2}: the t==0 init cells / first skip step.

    Adjacent labels are kept distinct: a repeat at input_length==2 is an
    impossible path (torch returns inf; the kernel's finite -1e13 sentinel
    intentionally differs there, mirroring the reference's NoBlankCTC
    sentinel semantics)."""
    rng = np.random.default_rng(7)
    T, B, C, L = 6, 4, 7, 1 if in_len_val == 1 else 2
    logits = rng.standard_normal((T, B, C)).astype(np.float32)
    targets = rng.integers(1, C, size=(B, L)).astype(np.int32)
    if L == 2:
        clash = targets[:, 1] == targets[:, 0]
        targets[clash, 1] = (targets[clash, 0] % (C - 1)) + 1
    in_len = np.full(B, in_len_val)
    tgt_len = np.full(B, L)

    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = torch.nn.CTCLoss(blank=0, reduction="sum", zero_infinity=False)(
        torch.nn.functional.log_softmax(t_logits, dim=2),
        torch.tensor(targets),
        torch.tensor(in_len),
        torch.tensor(tgt_len),
    )
    t_loss.backward()

    def via_pallas(lg):
        return losses.ctc_loss(
            lg,
            jnp.asarray(targets),
            jnp.asarray(in_len),
            jnp.asarray(tgt_len),
            reduction="sum",
            implementation="pallas",
            interpret=True,
        )

    v, g = jax.value_and_grad(via_pallas)(jnp.asarray(logits))
    np.testing.assert_allclose(float(v), float(t_loss.detach()), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g), t_logits.grad.numpy(), rtol=2e-3, atol=2e-5
    )


def test_blank_pallas_xla_fallback(monkeypatch, rng):
    """A Pallas compile failure degrades to the XLA path, not a crash."""
    import ctc_tpu.losses.blank as blank_mod

    def boom(*a, **k):
        raise RuntimeError("simulated pallas compile failure")

    monkeypatch.setattr(
        "ctc_tpu.ops.blank_lattice_pallas.blank_lattice_nll_pallas", boom
    )
    logits, targets, in_len, tgt_len = _loss_case(rng, 16, 3, 8, 4)
    args = (jnp.asarray(targets), jnp.asarray(in_len), jnp.asarray(tgt_len))
    with pytest.warns(UserWarning, match="falling back"):
        got = blank_mod.ctc_loss(
            jnp.asarray(logits), *args, implementation="pallas"
        )
    want = blank_mod.ctc_loss(jnp.asarray(logits), *args, implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
