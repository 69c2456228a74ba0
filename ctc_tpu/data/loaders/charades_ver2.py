"""Loader for the ver2 CTC+prediction dataset (``--dataset charades_ver2``).

First-window-only sampling (reference /root/reference/datasets/charades_ver2.py:489-513):
one sample per video starting at the first label, multi-hot o/v paths padded
to ``temporal`` with −1, and the first label past the window end included as
the final (future) path step.  Train with ``--loss binary`` over the object
paths.  ``get_val_video`` pairs the val windows with the ver2 groundtruth
table (charades_ver2.py:353-412 / the 'groundtruth' split of its ``get()``,
:661-670) for video-level evaluation.
"""

from __future__ import annotations

import os

import numpy as np

import jax

from ctc_tpu.data import charades as charades_data
from ctc_tpu.data.charades_variants import (
    prepare_ver2,
    prepare_ver2_future_groundtruth,
    prepare_ver2_groundtruth,
)
from ctc_tpu.data.features import extract_split_features
from ctc_tpu.data.loading import host_shard_indices


def collate_ver2(data: dict, indices, features: np.ndarray) -> dict:
    """Multi-hot object-path batch; the last in-length path step is the
    reference's future label (charades_ver2.py:474-484), so it doubles as the
    top-k metric target."""
    idx = list(indices)
    paths = np.stack(
        [np.asarray(data["o_targets"][i], np.float32) for i in idx]
    )
    paths = np.where(paths < 0, 0.0, paths)
    lengths = np.asarray([int(data["times"][i]) for i in idx], np.int64)
    temporal = features.shape[1]
    future = np.asarray(
        [int(np.argmax(paths[row, max(lengths[row] - 1, 0)]))
         for row in range(len(idx))],
        np.int32,
    )
    return {
        "feats": np.asarray(features, np.float32),
        "paths": paths,
        "input_lengths": np.full((len(idx),), temporal, np.int64),
        "target_lengths": lengths,
        "future_target": future,
    }


def _prepared_split(cfg, csv_file):
    labels = charades_data.parse_charades_csv(csv_file)
    frame_counts = {
        vid: charades_data.count_frames(cfg.rgb_data, vid) for vid in labels
    }
    data = prepare_ver2(
        labels, frame_counts, cfg.temporal, cfg.gap, cfg.num_trans,
        rgb_root=cfg.rgb_data,
    )
    return labels, data


def get(cfg):
    from ctc_tpu.data.loaders.charades_ctc_next_pred import _extractor

    out = []
    for split, csv_file in (("train", cfg.train_file), ("val", cfg.val_file)):
        _, data = _prepared_split(cfg, csv_file)
        n = len(data["ids"])
        if n == 0:
            out.append([])
            continue
        feats = extract_split_features(
            data, _extractor(cfg),
            os.path.join(cfg.cache, f"features_ver2_{split}"),
            gap=cfg.gap, inputsize=cfg.inputsize,
        )
        out.append([
            collate_ver2(data, idx, np.asarray(feats[idx]))
            for idx in host_shard_indices(
                n, cfg.batch_size,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                shuffle=(split == "train"), seed=cfg.manual_seed,
            )
        ])
    return out[0], out[1]


def get_val_video(cfg):
    """Val windows + ver2 ``[s, o, v]`` gt_table + features for
    :func:`ctc_tpu.eval.video.evaluate_videos` (the reference ver2 ``get()``'s
    'groundtruth' split return, charades_ver2.py:661-670)."""
    from ctc_tpu.data.loaders.charades_ctc_next_pred import _extractor

    labels, data = _prepared_split(cfg, cfg.val_file)
    gt_table = prepare_ver2_groundtruth(
        labels, cfg.temporal, cfg.gap, cfg.num_trans
    )
    if len(data["ids"]) == 0:
        return data, gt_table
    feats = extract_split_features(
        data, _extractor(cfg),
        os.path.join(cfg.cache, "features_ver2_val_video"),
        gap=cfg.gap, inputsize=cfg.inputsize,
    )
    data["features"] = np.asarray(feats)
    return data, gt_table


def get_future_groundtruth(cfg):
    """Future-label gt_table (charades_ver2.py:296-349), for future-prediction
    video scoring."""
    labels = charades_data.parse_charades_csv(cfg.val_file)
    return prepare_ver2_future_groundtruth(labels, cfg.temporal, cfg.gap)
