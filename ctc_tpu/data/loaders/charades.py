"""Loader for the v1 recognition dataset (``--dataset charades``).

The earliest reference variant (/root/reference/datasets/charades.py:288-461):
whole-video label-interval series with *variable-length* multi-hot o/v paths
(``time_length - 1`` steps, no future label, no padding).  Batches pad the
paths to the longest in the batch and train with ``--loss binary``
(multi-hot emissions); the per-sample true length rides in
``target_lengths`` exactly like the reference's ``meta`` lengths.
"""

from __future__ import annotations

import os

import numpy as np

import jax

from ctc_tpu.data import charades as charades_data
from ctc_tpu.data.charades_variants import prepare_v1
from ctc_tpu.data.features import extract_split_features
from ctc_tpu.data.loading import host_shard_indices


def collate_v1(data: dict, indices, features: np.ndarray) -> dict:
    """Pad the variable-length multi-hot o paths to the batch max."""
    idx = list(indices)
    lengths = [max(int(data["times"][i]) - 1, 1) for i in idx]
    max_l = max(lengths)
    n_cls = np.asarray(data["o_targets"][idx[0]]).shape[-1]
    paths = np.zeros((len(idx), max_l, n_cls), np.float32)
    for row, i in enumerate(idx):
        o = np.asarray(data["o_targets"][i], np.float32)
        paths[row, : o.shape[0]] = np.clip(o, 0.0, 1.0)
    temporal = features.shape[1]
    # no future label in v1: score the last attained path step instead
    future = np.asarray(
        [int(np.argmax(paths[row, lengths[row] - 1]))
         for row in range(len(idx))],
        np.int32,
    )
    return {
        "feats": np.asarray(features, np.float32),
        "paths": paths,
        "input_lengths": np.full((len(idx),), temporal, np.int64),
        "target_lengths": np.asarray(lengths, np.int64),
        "future_target": future,
    }


def get(cfg):
    from ctc_tpu.data.loaders.charades_ctc_next_pred import _extractor

    out = []
    for split, csv_file in (("train", cfg.train_file), ("val", cfg.val_file)):
        labels = charades_data.parse_charades_csv(csv_file)
        frame_counts = {
            vid: charades_data.count_frames(cfg.rgb_data, vid)
            for vid in labels
        }
        data = prepare_v1(
            labels, frame_counts, cfg.temporal, cfg.gap, rgb_root=cfg.rgb_data
        )
        n = len(data["ids"])
        if n == 0:
            out.append([])
            continue
        feats = extract_split_features(
            data, _extractor(cfg),
            os.path.join(cfg.cache, f"features_v1_{split}"),
            gap=cfg.gap, inputsize=cfg.inputsize,
        )
        out.append([
            collate_v1(data, idx, np.asarray(feats[idx]))
            for idx in host_shard_indices(
                n, cfg.batch_size,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                shuffle=(split == "train"), seed=cfg.manual_seed,
            )
        ])
    return out[0], out[1]
