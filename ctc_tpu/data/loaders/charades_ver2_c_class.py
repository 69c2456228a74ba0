"""Loader for the 157-class single-label variant (standard blank CTC).

Batches pair cached I3D features with the ``c_target`` class-index paths of
:func:`ctc_tpu.data.charades_variants.prepare_c_class`; train with
``--loss blank`` (reference usage: torch.nn.CTCLoss over combined classes,
SURVEY.md §2 #20).
"""

from __future__ import annotations

import os

import numpy as np

import jax

from ctc_tpu.data import charades
from ctc_tpu.data.charades_variants import prepare_c_class
from ctc_tpu.data.features import extract_split_features
from ctc_tpu.data.loading import host_shard_indices


def collate_c_class(data: dict, indices, features: np.ndarray) -> dict:
    idx = list(indices)
    paths = np.stack([np.asarray(data["c_targets"][i]) for i in idx])
    temporal = features.shape[1]
    return {
        "feats": np.asarray(features, np.float32),
        "paths": paths.astype(np.int32),
        "input_lengths": np.full((len(idx),), temporal, np.int64),
        "target_lengths": np.asarray([data["times"][i] for i in idx], np.int64),
        "future_target": np.asarray(
            [np.asarray(data["c_targets"][i])[max(data["times"][i] - 1, 0)]
             for i in idx],
            np.int32,
        ),
    }


def get(cfg):
    from ctc_tpu.data.loaders.charades_ctc_next_pred import _extractor

    out = []
    for split, csv_file in (("train", cfg.train_file), ("val", cfg.val_file)):
        labels = charades.parse_charades_csv(csv_file)
        frame_counts = {
            vid: charades.count_frames(cfg.rgb_data, vid) for vid in labels
        }
        data = prepare_c_class(
            labels, frame_counts, split, cfg.temporal, cfg.gap,
            rgb_root=cfg.rgb_data,
        )
        n = len(data["ids"])
        if n == 0:
            out.append([])
            continue
        feats = extract_split_features(
            data, _extractor(cfg),
            os.path.join(cfg.cache, f"features_cclass_{split}"),
            gap=cfg.gap, inputsize=cfg.inputsize,
        )
        out.append([
            collate_c_class(data, idx, np.asarray(feats[idx]))
            for idx in host_shard_indices(
                n, cfg.batch_size,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                shuffle=(split == "train"), seed=cfg.manual_seed,
            )
        ])
    return out[0], out[1]
