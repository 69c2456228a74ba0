"""Loader for the ver3 future-CE dataset (``--dataset charades_ver3``).

Same first-window sampling as ver2 but the target is a *single* future-time
multi-hot o/v vector (reference /root/reference/datasets/charades_ver3.py:516-526)
— a plain classification problem over the future label, not a lattice path.
Train with a final-step loss: ``--loss bce`` or ``--loss mlce`` (multi-hot
objects), or ``--loss ce`` (the first future verb as a class index).
"""

from __future__ import annotations

import os

import numpy as np

import jax

from ctc_tpu.data import charades as charades_data
from ctc_tpu.data.charades_variants import prepare_ver3
from ctc_tpu.data.features import extract_split_features
from ctc_tpu.data.loading import host_shard_indices


def collate_ver3(data: dict, indices, features: np.ndarray, loss: str) -> dict:
    idx = list(indices)
    o = np.stack([np.asarray(data["o_targets"][i], np.float32) for i in idx])
    v = np.stack([np.asarray(data["v_targets"][i], np.float32) for i in idx])
    temporal = features.shape[1]
    if loss == "ce":
        paths = np.argmax(v, axis=1).astype(np.int32)  # first future verb
        future = paths
    else:
        paths = o
        future = np.argmax(o, axis=1).astype(np.int32)
    return {
        "feats": np.asarray(features, np.float32),
        "paths": paths,
        # lengths are unused by final-step losses; kept for the batch contract
        "input_lengths": np.full((len(idx),), temporal, np.int64),
        "target_lengths": np.ones((len(idx),), np.int64),
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
        data = prepare_ver3(
            labels, frame_counts, split, cfg.temporal, cfg.gap, cfg.num_trans,
            rgb_root=cfg.rgb_data,
        )
        n = len(data["ids"])
        if n == 0:
            out.append([])
            continue
        feats = extract_split_features(
            data, _extractor(cfg),
            os.path.join(cfg.cache, f"features_ver3_{split}"),
            gap=cfg.gap, inputsize=cfg.inputsize,
        )
        out.append([
            collate_ver3(data, idx, np.asarray(feats[idx]), cfg.loss)
            for idx in host_shard_indices(
                n, cfg.batch_size,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                shuffle=(split == "train"), seed=cfg.manual_seed,
            )
        ])
    return out[0], out[1]
