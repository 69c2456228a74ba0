"""Loader for the ver2 CTC+prediction dataset (``--dataset charades_ver2``).

First-window-only sampling (reference /root/reference/datasets/charades_ver2.py:489-513):
one sample per video starting at the first label, multi-hot o/v paths padded
to ``temporal`` with −1, and the first label past the window end included as
the final (future) path step.  Train with ``--loss binary`` over the object
paths.  ``get_val_video`` pairs the val windows with the ver2 groundtruth
table (charades_ver2.py:353-412 / the 'groundtruth' split of its ``get()``,
:661-670) for video-level evaluation; it shares the ``features_ver2_val``
feature cache with ``get()`` (same windows, extracted once).
"""

from __future__ import annotations

import numpy as np

from ctc_tpu.data.charades_variants import (
    prepare_ver2,
    prepare_ver2_future_groundtruth,
    prepare_ver2_groundtruth,
)
from ctc_tpu.data.loaders._common import (
    prepared_split,
    split_batches,
    split_features,
)


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


def _prepare(cfg):
    def prepare(labels, frame_counts):
        return prepare_ver2(
            labels, frame_counts, cfg.temporal, cfg.gap, cfg.num_trans,
            rgb_root=cfg.rgb_data,
        )

    return prepare


def get(cfg):
    return tuple(
        split_batches(cfg, split, csv_file, _prepare(cfg), "features_ver2",
                      collate_ver2)
        for split, csv_file in
        (("train", cfg.train_file), ("val", cfg.val_file))
    )


def get_val_video(cfg):
    """Val windows + ver2 ``[s, o, v]`` gt_table + features for
    :func:`ctc_tpu.eval.video.evaluate_videos` (the reference ver2 ``get()``'s
    'groundtruth' split return, charades_ver2.py:661-670)."""
    labels, data = prepared_split(cfg, cfg.val_file, _prepare(cfg))
    gt_table = prepare_ver2_groundtruth(
        labels, cfg.temporal, cfg.gap, cfg.num_trans
    )
    if len(data["ids"]) == 0:
        return data, gt_table
    # same windows as get()'s val split -> same feature cache
    data["features"] = np.asarray(
        split_features(cfg, data, "features_ver2", "val")
    )
    return data, gt_table


def get_future_groundtruth(cfg):
    """Future-label gt_table (charades_ver2.py:296-349), for future-prediction
    video scoring."""
    from ctc_tpu.data import charades as charades_data

    labels = charades_data.parse_charades_csv(cfg.val_file)
    return prepare_ver2_future_groundtruth(labels, cfg.temporal, cfg.gap)
