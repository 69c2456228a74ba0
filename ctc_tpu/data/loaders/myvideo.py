"""Own-video eval loader, v1 twin (``--my-dataset myvideo``).

Start-time class-index o/v paths (+1-shifted to spare index 0 for a blank
slot) padded to the corpus max path length, at FPS=29.94 (reference
/root/reference/datasets/myvideo.py:296-449).  Eval convention: returns
``(data, None)`` with an attached ``features`` array, like charades_my_pred.
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np

from ctc_tpu.data.charades_variants import MYVIDEO_LABELS, prepare_myvideo
from ctc_tpu.data.features import extract_split_features


def _frame_counts(cfg, labels):
    return {
        vid: len(glob(os.path.join(cfg.rgb_my_data, vid, "*.jpg")))
        for vid in labels
    }


def get(cfg, labels: dict | None = None):
    labels = labels or MYVIDEO_LABELS
    data = prepare_myvideo(
        labels, _frame_counts(cfg, labels), cfg.temporal, cfg.gap,
        rgb_root=cfg.rgb_my_data,
    )
    if len(data["ids"]) == 0:
        return data, None
    from ctc_tpu.data.loaders.charades_ctc_next_pred import _extractor

    feats = extract_split_features(
        data, _extractor(cfg),
        os.path.join(cfg.cache, "features_myvideo"),
        gap=cfg.gap, inputsize=cfg.inputsize,
    )
    data["features"] = np.asarray(feats)
    return data, None
