"""Own-video ('my dataset') evaluation loader (reference default
``--my-dataset charades_my_pred``, opts.py:15; dense stride-1 windows over the
self-recorded video with the hardcoded label dict)."""

from __future__ import annotations

import os

import numpy as np

from ctc_tpu.data.charades_variants import MYVIDEO_LABELS, prepare_my_pred
from ctc_tpu.data.features import extract_split_features


def get(cfg, labels: dict | None = None):
    """Returns ``(data, None)`` — windows + o/v multi-hot paths + features
    for qualitative own-video evaluation."""
    from glob import glob

    labels = labels or MYVIDEO_LABELS
    frame_counts = {
        vid: len(glob(os.path.join(cfg.rgb_my_data, vid, "*.jpg")))
        for vid in labels
    }
    data = prepare_my_pred(
        labels, frame_counts, cfg.temporal, cfg.gap, rgb_root=cfg.rgb_my_data
    )
    if len(data["ids"]) == 0:
        return data, None
    from ctc_tpu.data.loaders.charades_ctc_next_pred import _extractor

    feats = extract_split_features(
        data, _extractor(cfg),
        os.path.join(cfg.cache, "features_my_pred"),
        gap=cfg.gap, inputsize=cfg.inputsize,
    )
    data["features"] = np.asarray(feats)
    return data, None
