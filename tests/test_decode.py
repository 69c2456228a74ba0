"""Decoding tests: greedy collapse rules, beam search vs exhaustive search,
Viterbi alignment vs brute force."""

import itertools

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu import losses
from ctc_tpu.decode import (
    beam_search_decode,
    collapse_repeats,
    greedy_decode,
    viterbi_align,
)


def test_collapse_repeats_rules():
    labels = jnp.asarray(
        [
            [0, 1, 1, 0, 2, 2, 2, 1],   # -> 1 2 1
            [3, 3, 3, 3, 3, 3, 3, 3],   # -> 3
            [0, 0, 0, 0, 0, 0, 0, 0],   # -> (empty)
        ],
        dtype=jnp.int32,
    )
    lengths = jnp.asarray([8, 8, 8])
    out, out_len = collapse_repeats(labels, lengths, blank=0)
    np.testing.assert_array_equal(np.asarray(out_len), [3, 1, 0])
    np.testing.assert_array_equal(np.asarray(out[0, :3]), [1, 2, 1])
    np.testing.assert_array_equal(np.asarray(out[1, :1]), [3])
    assert np.all(np.asarray(out[2]) == -1)


def test_collapse_respects_lengths():
    labels = jnp.asarray([[1, 2, 3, 4, 5, 6]], dtype=jnp.int32)
    out, out_len = collapse_repeats(labels, jnp.asarray([3]), blank=0)
    np.testing.assert_array_equal(np.asarray(out_len), [3])
    np.testing.assert_array_equal(np.asarray(out[0, :3]), [1, 2, 3])


def test_greedy_decode_shapes(rng):
    logits = jnp.asarray(rng.standard_normal((12, 4, 7)).astype(np.float32))
    lengths = jnp.asarray([12, 7, 3, 1])
    decoded, dec_len, frames = greedy_decode(logits, lengths)
    assert decoded.shape == (4, 12)
    assert frames.shape == (4, 12)
    assert int(dec_len.max()) <= 12


def _brute_force_best_sequence(logits, T, C, blank=0, max_len=None):
    """Exhaustive argmax_{label seq} p(seq | logits) via our ctc_loss."""
    max_len = max_len or T
    best, best_seq = -np.inf, ()
    for length in range(0, max_len + 1):
        for seq in itertools.product(range(1, C), repeat=length):
            if length == 0:
                seq = ()
            tgt = np.full((1, max(max_len, 1)), 0, np.int32)
            tgt[0, :length] = seq
            nll = losses.ctc_loss(
                logits,
                jnp.asarray(tgt),
                jnp.asarray([T]),
                jnp.asarray([length]),
                blank=blank,
                reduction="none",
            )
            logp = -float(nll[0])
            if logp > best:
                best, best_seq = logp, tuple(seq)
    return best, best_seq


def test_beam_search_finds_exhaustive_best(rng):
    T, C = 5, 3  # classes {1, 2} + blank
    logits = jnp.asarray(
        (rng.standard_normal((T, 1, C)) * 2).astype(np.float32)
    )
    best_logp, best_seq = _brute_force_best_sequence(logits, T, C)

    prefixes, lens, scores = beam_search_decode(
        logits, jnp.asarray([T]), beam_width=16, prune=C, blank=0
    )
    got = tuple(np.asarray(prefixes[0, 0, : int(lens[0, 0])]).tolist())
    assert got == best_seq, (got, best_seq)
    np.testing.assert_allclose(float(scores[0, 0]), best_logp, rtol=1e-4, atol=1e-4)


def test_beam_search_batch_and_lengths(rng):
    logits = jnp.asarray(rng.standard_normal((8, 3, 5)).astype(np.float32))
    lengths = jnp.asarray([8, 4, 1])
    prefixes, lens, scores = beam_search_decode(
        logits, lengths, beam_width=4, prune=5
    )
    assert prefixes.shape == (3, 4, 8)
    # scores sorted best-first
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-5)
    # sample with input length 1 decodes at most 1 label
    assert int(lens[2, 0]) <= 1


def test_viterbi_matches_brute_force(rng):
    T, B, L = 6, 2, 3
    em = jnp.asarray(rng.standard_normal((T, B, L)).astype(np.float32))
    in_len = jnp.asarray([6, 4])
    tgt_len = jnp.asarray([3, 2])
    alignment, score = viterbi_align(em, in_len, tgt_len)

    for b in range(B):
        Tb, Lb = int(in_len[b]), int(tgt_len[b])
        best, best_path = -np.inf, None
        # all monotone alignments: choose Lb-1 advance times among t=1..Tb-1
        for advs in itertools.combinations(range(1, Tb), Lb - 1):
            pos, path, s = 0, [], 0.0
            for t in range(Tb):
                if t in advs:
                    pos += 1
                path.append(pos)
                s += float(em[t, b, pos])
            if s > best:
                best, best_path = s, path
        np.testing.assert_allclose(float(score[b]), best, rtol=1e-5, atol=1e-4)
        got = np.asarray(alignment[:Tb, b]).tolist()
        assert got == best_path, (b, got, best_path)
