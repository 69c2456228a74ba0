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


# ---- the decode PRODUCT surface (round-4: --decode through the CLI) ----


def _decode_model_and_batches(num_batches=2, batch_size=4, temporal=8, c=9):
    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.train import Trainer

    batches = synthetic_feature_batches(
        num_batches=num_batches, batch_size=batch_size, temporal=temporal,
        feat_dim=16, num_classes=c, seed=5,
    )
    model = LSTMHead(hidden=c, dropout_rate=0.0)
    tr = Trainer(model, loss_kind="noblank", implementation="xla")
    state = tr.init_state(batches[0])
    return model, state, batches


def test_decode_windows_matches_greedy_decode(tmp_path):
    """decode_windows == decode.greedy_decode applied to the same model
    outputs, and its CSV rows reproduce the decoded paths."""
    import csv

    from ctc_tpu.eval.video import decode_windows

    model, state, batches = _decode_model_and_batches()
    out_csv = str(tmp_path / "decoded.csv")
    out = decode_windows(model, state, batches, blank=-1, out_csv=out_csv)

    rows = list(csv.reader(open(out_csv)))
    assert rows[0] == ["batch", "index", "length", "path"]
    assert len(rows) - 1 == out["decoded"].shape[0] == 8

    row_i = 1
    for batch in batches:
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.transpose(jnp.asarray(batch["feats"]), (1, 0, 2)),
            train=False,
        )
        want, want_len, _ = greedy_decode(
            logits, jnp.asarray(batch["input_lengths"]), blank=-1
        )
        for i in range(want.shape[0]):
            n = int(want_len[i])
            path = " ".join(str(int(x)) for x in np.asarray(want[i, :n]))
            assert rows[row_i][2] == str(n)
            assert rows[row_i][3] == path
            row_i += 1


def test_decode_windows_seq_sharded_matches_unsharded():
    """seq_mesh decode (ppermute boundary exchange) == unsharded decode."""
    from jax.sharding import Mesh

    from ctc_tpu.eval.video import decode_windows

    model, state, batches = _decode_model_and_batches(temporal=8)
    plain = decode_windows(model, state, batches, blank=-1)
    smesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    sharded = decode_windows(model, state, batches, blank=-1, seq_mesh=smesh)
    np.testing.assert_array_equal(plain["decoded"], sharded["decoded"])
    np.testing.assert_array_equal(plain["lengths"], sharded["lengths"])


def test_cli_evaluate_decode_flag(tmp_path):
    """--evaluate --decode emits decoded_predictions.csv with one row per
    val window, for both the plain and the --seq-parallel paths."""
    import csv

    from ctc_tpu.cli.main import main

    argv = lambda name, extra: [
        "--dataset", "synthetic", "--epochs", "1", "--batch-size", "4",
        "--temporal", "8", "--extract-feat-dim", "16", "--dropout", "0.0",
        "--cache-dir", str(tmp_path), "--name", name,
        "--print-train-freq", "100", "--print-test-freq", "100",
        "--evaluate", "--decode", *extra,
    ]
    metrics = main(argv("dec", []))
    path = metrics["decoded_csv"]
    rows = list(csv.reader(open(path)))
    assert len(rows) - 1 == 2 * 4  # 2 val batches x batch 4
    assert all(r[2].isdigit() for r in rows[1:])

    metrics_seq = main(argv("dec-seq", ["--seq-parallel", "4"]))
    rows_seq = list(csv.reader(open(metrics_seq["decoded_csv"])))
    assert rows_seq == rows  # sharded decode reproduces the plain paths


def test_decode_windows_beam_matches_beam_search(tmp_path):
    """beam_width routes decode_windows through prefix beam search (best
    beam kept), and the CLI flag --decode-beam reaches it (blank loss)."""
    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.eval.video import decode_windows
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.train import Trainer

    c = 7
    batches = synthetic_feature_batches(
        num_batches=1, batch_size=3, temporal=8, feat_dim=16,
        num_classes=c, max_path=3, seed=9,
    )
    model = LSTMHead(hidden=c, dropout_rate=0.0)
    tr = Trainer(model, loss_kind="blank", implementation="xla")
    state = tr.init_state(batches[0])
    out = decode_windows(model, state, batches, blank=0, beam_width=4)

    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.transpose(jnp.asarray(batches[0]["feats"]), (1, 0, 2)),
        train=False,
    )
    prefixes, lens, _ = beam_search_decode(
        logits, jnp.asarray(batches[0]["input_lengths"]),
        beam_width=4, blank=0,
    )
    np.testing.assert_array_equal(out["lengths"], np.asarray(lens[:, 0]))
    for i in range(3):
        n = int(lens[i, 0])
        np.testing.assert_array_equal(
            out["decoded"][i, :n], np.asarray(prefixes[i, 0, :n])
        )

    import pytest

    with pytest.raises(ValueError, match="blank"):
        decode_windows(model, state, batches, blank=-1, beam_width=4)


def test_cli_decode_beam_flag(tmp_path):
    import csv

    from ctc_tpu.cli.main import main

    metrics = main([
        "--dataset", "synthetic", "--epochs", "1", "--batch-size", "4",
        "--temporal", "8", "--extract-feat-dim", "16", "--dropout", "0.0",
        "--c-class", "9", "--loss", "blank",
        "--cache-dir", str(tmp_path), "--name", "beam",
        "--print-train-freq", "100", "--print-test-freq", "100",
        "--evaluate", "--decode", "--decode-beam", "4",
    ])
    rows = list(csv.reader(open(metrics["decoded_csv"])))
    assert len(rows) - 1 == 8

    import pytest

    with pytest.raises(SystemExit, match="blank"):
        main([
            "--dataset", "synthetic", "--epochs", "1", "--batch-size", "4",
            "--temporal", "8", "--extract-feat-dim", "16",
            "--cache-dir", str(tmp_path), "--name", "beam-bad",
            "--print-train-freq", "100", "--print-test-freq", "100",
            "--evaluate", "--decode", "--decode-beam", "4",
        ])


def test_cli_decode_align_flag(tmp_path):
    """--evaluate --decode-align: the CSV rows equal a direct viterbi_align
    over the same emissions (forced alignment of the TARGET paths)."""
    import csv

    from ctc_tpu.cli.main import main
    from ctc_tpu.data.loaders import synthetic as synth_loader
    from ctc_tpu.config import parse

    argv = [
        "--dataset", "synthetic", "--epochs", "1", "--batch-size", "4",
        "--temporal", "8", "--extract-feat-dim", "16", "--dropout", "0.0",
        "--v-class", "9", "--loss", "noblank",
        "--cache-dir", str(tmp_path), "--name", "align",
        "--print-train-freq", "100", "--print-test-freq", "100",
        "--evaluate", "--decode-align",
    ]
    metrics = main(argv)
    rows = list(csv.reader(open(metrics["alignment_csv"])))
    assert rows[0] == ["batch", "index", "input_length", "score", "alignment"]
    assert len(rows) - 1 == 8  # 2 val batches x 4 windows

    # alignments are valid monotonic stay/advance paths ending at L-1
    cfg = parse(argv)
    _, val = synth_loader.get(cfg)
    flat = [
        (np.asarray(b["input_lengths"])[i], np.asarray(b["target_lengths"])[i])
        for b in val for i in range(4)
    ]
    for row, (in_len, tgt_len) in zip(rows[1:], flat):
        ali = np.array([int(x) for x in row[4].split()])
        assert len(ali) == int(row[2]) == in_len
        assert ali[0] == 0 and ali[-1] == tgt_len - 1
        steps = np.diff(ali)
        assert np.all((steps == 0) | (steps == 1))

    import pytest

    with pytest.raises(SystemExit, match="blank-free"):
        main([
            "--dataset", "synthetic", "--epochs", "1", "--batch-size", "4",
            "--temporal", "8", "--extract-feat-dim", "16",
            "--c-class", "9", "--loss", "blank",
            "--cache-dir", str(tmp_path), "--name", "align-bad",
            "--print-train-freq", "100", "--print-test-freq", "100",
            "--evaluate", "--decode-align",
        ])
