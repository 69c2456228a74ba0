"""Video-level evaluation driver — the reference's *intended* val_video path
(main.py:50 calls an undefined ``validate_video`` and crashes, SURVEY.md §2.3;
the machinery in utils/map.py + utils/__init__.py was dead).  Here it works:

1. run the model over every val_video window (10 linspaced windows/video),
2. aggregate per-video class scores (mean of final-timestep logits),
3. Charades mAP over future verbs (:func:`video_verb_map`) and, for models
   with (o, v) heads, relation tagging via score composition
   (:func:`video_relation_eval`).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ctc_tpu.eval.map import charades_map
from ctc_tpu.eval.relation import compose_ov_predictions, eval_visual_relation


def aggregate_video_scores(ids, window_scores) -> dict:
    """Mean per-video of ``[N_windows, C]`` scores grouped by video id."""
    buckets = defaultdict(list)
    for vid, s in zip(ids, window_scores):
        buckets[vid].append(np.asarray(s))
    return {vid: np.mean(rows, axis=0) for vid, rows in buckets.items()}


def video_verb_map(video_scores: dict, gt_table: dict, num_verbs: int,
                   gt_col: int = 2):
    """Charades mAP over future verbs (or objects, for multi-hot heads).

    Args:
      video_scores: ``{vid: [num_verbs] scores}``.
      gt_table: ``{vid: [[s, o, v], ...]}`` (prepare_windows val_video output).
      gt_col: which gt-triplet column the scores live in — 2 (verb, default)
        for verb-index heads, 1 (object) for the 38-object multi-hot heads.

    Returns ``(mAP, weighted_ap, per_class_ap)``.
    """
    vids = [v for v in gt_table if v in video_scores]
    scores = np.stack([video_scores[v] for v in vids])
    gt = np.zeros((len(vids), num_verbs), np.int64)
    for i, vid in enumerate(vids):
        for row in gt_table[vid]:
            gt[i, row[gt_col]] = 1
    return charades_map(scores, gt)


def video_relation_eval(video_o_scores: dict, video_v_scores: dict,
                        gt_table: dict):
    """(object, verb) tagging eval: compose top pair scores per video and run
    the relation evaluation against ``gt_table`` (s dropped — ov pairs)."""
    prediction = {}
    for vid in gt_table:
        if vid not in video_o_scores:
            continue
        preds = compose_ov_predictions(
            video_o_scores[vid], video_v_scores[vid]
        )
        prediction[vid] = preds
    gt_ov = {
        vid: [(o, v) for _, o, v in rows] for vid, rows in gt_table.items()
    }
    return eval_visual_relation(prediction, gt_ov)


def score_windows(model, state, feats: np.ndarray,
                  batch_size: int = 10, reduce: str = "final") -> np.ndarray:
    """Per-window class scores for ``[N, T, F]`` feature windows.

    ``reduce='final'`` (default, used by every product path incl. the
    relation-tagging eval) takes the final timestep's logits — the
    reference's prediction semantics (/root/reference/train.py:434);
    ``'mean'`` averages logits over time (a presence-detector alternative;
    measured WORSE for the joint relation eval on-chip, see
    :func:`evaluate_videos_joint`).
    """
    import jax
    import jax.numpy as jnp

    n = feats.shape[0]

    @jax.jit
    def forward(x):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.transpose(x, (1, 0, 2)),
            train=False,
        )
        return logits[-1] if reduce == "final" else jnp.mean(logits, axis=0)

    window_scores = []
    for i0 in range(0, n, batch_size):
        window_scores.extend(
            np.asarray(forward(jnp.asarray(feats[i0 : i0 + batch_size])))
        )
    return np.stack(window_scores)


def evaluate_videos(model, state, data, gt_table, *, batch_size: int = 10,
                    num_verbs: int = 33, gt_col: int = 2):
    """Run the LSTM head over val_video windows and compute verb mAP.

    Args:
      model/state: flax model + TrainState (eval mode, batch stats used).
      data: a val_video ``prepare_windows`` dict with a ``features`` array
        ``[N, T, F]`` attached under ``data['features']``.
    """
    window_scores = score_windows(
        model, state, np.asarray(data["features"]), batch_size
    )
    video_scores = aggregate_video_scores(data["ids"], window_scores)
    m_ap, w_ap, per_class = video_verb_map(
        video_scores, gt_table, num_verbs, gt_col
    )
    return {"mAP": float(m_ap), "video_scores": video_scores,
            "per_class_ap": per_class}


def evaluate_videos_joint(model, state, data, gt_table, *, num_verbs: int,
                          num_objects: int, batch_size: int = 10,
                          reduce: str = "final"):
    """Video-level eval for the joint (o, v) two-head model: verb mAP,
    object mAP, AND the relation-tagging metrics — the live consumer of
    :func:`video_relation_eval` (the reference's relation eval,
    /root/reference/utils/__init__.py:61-113, was dead code).

    ``reduce`` selects the per-window score reduction for BOTH heads:
    ``'final'`` (default — the reference's final-timestep prediction
    semantics, measured better on-chip at the synthetic record:
    object mAP 0.556 vs 0.389 time-mean) or ``'mean'`` (time-averaged
    presence scores).

    Returns ``{"mAP", "object_mAP", "relation_mAP",
    "recall_at": {50, 100}, "prec_at": {1, 5, 10}, ...}``.
    """
    scores = score_windows(
        model, state, np.asarray(data["features"]), batch_size, reduce
    )
    assert scores.shape[1] == num_verbs + num_objects, (
        scores.shape, num_verbs, num_objects
    )
    v_scores = aggregate_video_scores(data["ids"], scores[:, :num_verbs])
    o_scores = aggregate_video_scores(data["ids"], scores[:, num_verbs:])
    v_map, _, v_per_class = video_verb_map(
        v_scores, gt_table, num_verbs, gt_col=2
    )
    o_map, _, _ = video_verb_map(o_scores, gt_table, num_objects, gt_col=1)
    rel_map, rec_at, prec_at = video_relation_eval(
        o_scores, v_scores, gt_table
    )
    return {
        "mAP": float(v_map),
        "object_mAP": float(o_map),
        "relation_mAP": float(rel_map),
        "recall_at": rec_at,
        "prec_at": prec_at,
        "video_scores": v_scores,
        "per_class_ap": v_per_class,
    }


def decode_windows(model, state, batches, *, blank: int = -1,
                   out_csv: str | None = None, seq_mesh=None,
                   beam_width: int = 0, head_slice: int | None = None):
    """Greedy-decode the label-transition path of every window.

    The product surface for :mod:`ctc_tpu.decode` (the reference never
    decodes — its prediction is the final timestep's argmax,
    /root/reference/train.py:434; this emits the full collapsed transition
    path the lattice was trained on).

    Args:
      batches: iterable of batch dicts (``feats [B, T, F]``,
        ``input_lengths [B]``) — e.g. the val loader.
      blank: blank id for the repeat/blank collapse; ``-1`` (default) for
        the blank-free losses = collapse repeats only.
      out_csv: optional path — one row per window:
        ``batch, index, length, path`` (space-joined class indices).
      seq_mesh: a Mesh with a ``seq`` axis — decode runs T-sharded with
        ppermute boundary-label exchange
        (:func:`ctc_tpu.parallel.seq_lattice.make_seq_sharded_greedy_decode`).
      beam_width: > 0 decodes with prefix beam search instead of greedy
        (:func:`ctc_tpu.decode.beam_search_decode`, best beam kept) —
        blank-CTC only (the beam tracks blank/non-blank prefix mass), and
        exclusive with ``seq_mesh``.
      head_slice: decode only the first this-many classes (the verb slice
        of a joint (o, v) head).

    Returns ``{"decoded": [N, T] -1-padded, "lengths": [N]}``.
    """
    import csv

    import jax
    import jax.numpy as jnp

    from ctc_tpu.decode.greedy import greedy_decode

    if beam_width:
        if blank < 0:
            raise ValueError(
                "beam decode needs a blank symbol (--loss blank)"
            )
        if seq_mesh is not None:
            raise ValueError("beam decode does not compose with seq_mesh")
        from ctc_tpu.decode import beam_search_decode

    seq_decode = None
    if seq_mesh is not None:
        from ctc_tpu.parallel.seq_lattice import (
            make_seq_sharded_greedy_decode,
            shard_time_axis,
        )

        seq_decode = make_seq_sharded_greedy_decode(seq_mesh, blank=blank)

    @jax.jit
    def forward(x):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.transpose(x, (1, 0, 2)),
            train=False,
        )  # [T, B, C]
        return logits[..., :head_slice] if head_slice else logits

    all_decoded, all_lengths, rows = [], [], []
    for bi, batch in enumerate(batches):
        logits = forward(jnp.asarray(batch["feats"]))
        input_lengths = jnp.asarray(batch["input_lengths"])
        if seq_decode is not None:
            decoded, lengths = seq_decode(
                shard_time_axis(logits, seq_mesh), input_lengths
            )
        elif beam_width:
            prefixes, lens, _scores = beam_search_decode(
                logits, input_lengths, beam_width=beam_width, blank=blank
            )
            decoded = jnp.where(
                jnp.arange(prefixes.shape[2])[None, :] < lens[:, 0, None],
                prefixes[:, 0, :], -1,
            ).astype(jnp.int32)
            lengths = lens[:, 0]
        else:
            decoded, lengths, _ = greedy_decode(
                logits, input_lengths, blank=blank
            )
        decoded, lengths = np.asarray(decoded), np.asarray(lengths)
        all_decoded.append(decoded)
        all_lengths.append(lengths)
        for i in range(decoded.shape[0]):
            path = " ".join(str(int(c)) for c in decoded[i, : lengths[i]])
            rows.append([bi, i, int(lengths[i]), path])
    if out_csv:
        with open(out_csv, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["batch", "index", "length", "path"])
            writer.writerows(rows)
    return {
        "decoded": np.concatenate(all_decoded, axis=0),
        "lengths": np.concatenate(all_lengths, axis=0),
    }


def align_windows(model, state, batches, *, loss_kind: str = "noblank",
                  out_csv: str | None = None):
    """Viterbi time-alignment of every window's TARGET path — the
    forced-alignment capability the blank-free lattice supports
    (:func:`ctc_tpu.decode.viterbi.viterbi_align`, max-product counterpart
    of the trained sum-product DP; the reference has no alignment decoder).

    For each window the model's logits are turned into the same per-cell
    emissions the loss trains on (softmax gather for ``'noblank'``, BCE for
    ``'binary'`` — /root/reference/NoBlankCTC.py:96-102 /
    NoBlankBinaryCTC.py:108-116 semantics) and the best monotonic
    stay/advance alignment of frames to path positions is decoded.

    Args:
      batches: iterable of batch dicts (``feats``, ``paths``,
        ``input_lengths``, ``target_lengths``).
      loss_kind: ``'noblank'`` (int paths) or ``'binary'`` (multi-hot
        paths) — the blank lattice has a different topology and is not
        supported here.
      out_csv: optional path — one row per window:
        ``batch, index, input_length, score, alignment`` (space-joined
        path position per frame).

    Returns ``{"alignment": [N, T] int32, "score": [N]}``.
    """
    import csv

    import jax
    import jax.numpy as jnp

    from ctc_tpu.decode.viterbi import viterbi_align
    from ctc_tpu.ops.emissions import (
        binary_ce_emissions,
        gather_log_softmax_emissions,
    )

    if loss_kind not in ("noblank", "binary"):
        raise ValueError(
            f"alignment decodes the blank-free lattice; got {loss_kind!r}"
        )
    build = (gather_log_softmax_emissions if loss_kind == "noblank"
             else binary_ce_emissions)

    @jax.jit
    def aligned(feats, paths, input_lengths, target_lengths):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.transpose(feats, (1, 0, 2)),
            train=False,
        )  # [T, B, C]
        em = build(logits, paths)  # [T, B, L]
        return viterbi_align(em, input_lengths, target_lengths)

    all_align, all_scores, rows = [], [], []
    for bi, batch in enumerate(batches):
        alignment, score = aligned(
            jnp.asarray(batch["feats"]), jnp.asarray(batch["paths"]),
            jnp.asarray(batch["input_lengths"]),
            jnp.asarray(batch["target_lengths"]),
        )
        alignment = np.asarray(alignment).T  # [B, T]
        score = np.asarray(score)
        lengths = np.asarray(batch["input_lengths"])
        all_align.append(alignment)
        all_scores.append(score)
        for i in range(alignment.shape[0]):
            ali = " ".join(str(int(p)) for p in alignment[i, : lengths[i]])
            rows.append([bi, i, int(lengths[i]), float(score[i]), ali])
    if out_csv:
        with open(out_csv, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(
                ["batch", "index", "input_length", "score", "alignment"]
            )
            writer.writerows(rows)
    return {
        "alignment": np.concatenate(all_align, axis=0),
        "score": np.concatenate(all_scores, axis=0),
    }


def evaluate_own_video(model, state, data, *, out_csv: str | None = None,
                       topk: int = 5, batch_size: int = 10):
    """Qualitative own-video evaluation — the reference's my-dataset path
    (main.py builds a ``myvideo_loader`` from ``--my-dataset``,
    datasets/__init__.py:22,42, consumed by hand): final-timestep top-k class
    predictions for every dense window, optionally dumped one row per window
    to ``out_csv`` (video id, window index, top-k class indices).
    """
    import csv

    scores = score_windows(
        model, state, np.asarray(data["features"]), batch_size
    )
    top = np.argsort(-scores, axis=1)[:, :topk]
    if out_csv:
        with open(out_csv, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(
                ["id", "window"] + [f"top{k + 1}" for k in range(topk)]
            )
            window_of = defaultdict(int)
            for i, vid in enumerate(data["ids"]):
                writer.writerow([vid, window_of[vid]] + list(map(int, top[i])))
                window_of[vid] += 1
    return {"topk": top, "scores": scores}
