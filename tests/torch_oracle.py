"""Vectorized CPU torch oracles for the blank-free lattice losses.

These are independent (vectorized) implementations of the same math as the
reference's python-loop DPs (/root/reference/NoBlankCTC.py,
/root/reference/NoBlankBinaryCTC.py), used for parity tests at the BASELINE
shapes (B=8, T=128, C=157) where the genuine interpreted reference would take
minutes.  ``tests/test_parity_reference.py`` separately cross-checks these
oracles against the *genuine* reference modules at small shapes.
"""

import torch

NEG = -1.0e13


def _lattice_nll(em, input_lengths, target_lengths):
    """Forward DP over emissions ``em [T, B, L]`` -> per-sample NLL ``[B]``."""
    T, B, L = em.shape
    outside = torch.arange(L)[None, :] >= target_lengths[:, None]
    alpha = torch.full((B, L), NEG, dtype=em.dtype)
    alpha = alpha.clone()
    alpha[:, 0] = 0.0
    finals = torch.zeros(B, dtype=em.dtype)
    last = (target_lengths - 1).clamp(min=0).unsqueeze(1)
    for t in range(T):
        if t == 0:
            shifted = torch.full((B, L), NEG, dtype=em.dtype)
        else:
            shifted = torch.cat(
                [torch.full((B, 1), NEG, dtype=em.dtype), alpha[:, :-1]], dim=1
            )
        lse = torch.logaddexp(alpha, shifted)
        lse = torch.where(outside, torch.full_like(lse, NEG), lse)
        alpha = lse + em[t]
        sel = t == (input_lengths - 1)
        gathered = alpha.gather(1, last)[:, 0]
        finals = torch.where(sel, gathered, finals)
    return -finals


def noblank_ctc_loss(logits, paths, input_lengths, target_lengths):
    """Oracle for NoBlankCTC: log-softmax emissions, batch-mean NLL."""
    T, B, C = logits.shape
    L = paths.shape[1]
    logp = torch.nn.functional.log_softmax(logits, dim=2)
    idx = (paths.long() % C).unsqueeze(0).expand(T, B, L)
    em = logp.gather(2, idx)
    return _lattice_nll(em, input_lengths, target_lengths).mean()


def noblank_binary_ctc_loss(logits, paths, input_lengths, target_lengths):
    """Oracle for NoBlankBinaryCTC: negative mean-BCE emissions.

    ``em[t,b,l] = (1/C) sum_c [ path*clamp(log p) + (1-path)*clamp(log(1-p)) ]``
    with torch.nn.BCELoss's -100 log clamp.
    """
    C = logits.shape[2]
    p = torch.sigmoid(logits)
    log_p = torch.clamp(torch.log(p), min=-100.0)
    log_1mp = torch.clamp(torch.log1p(-p), min=-100.0)
    # em[t,b,l] = (paths[b,l,:] @ (log_p - log_1mp)[t,b,:] + sum(log_1mp)) / C
    em = (
        torch.einsum("blc,tbc->tbl", paths, log_p - log_1mp)
        + log_1mp.sum(dim=2)[:, :, None]
    ) / C
    return _lattice_nll(em, input_lengths, target_lengths).mean()
