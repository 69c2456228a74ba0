"""Own-video eval loader, ver3 twin (``--my-dataset myvideo_ver3``).

Current-time o/v single-label targets on a fixed ``temporal``-step time grid
(reference /root/reference/datasets/myvideo_ver3.py:300-457, returns
``(img, o, v, meta)``).  Eval convention: ``(data, None)`` with features.
"""

from __future__ import annotations

import os

import numpy as np

from ctc_tpu.data.charades_variants import MYVIDEO_LABELS, prepare_myvideo_ver3
from ctc_tpu.data.features import extract_split_features
from ctc_tpu.data.loaders.myvideo import _frame_counts


def get(cfg, labels: dict | None = None):
    labels = labels or MYVIDEO_LABELS
    data = prepare_myvideo_ver3(
        labels, _frame_counts(cfg, labels), cfg.temporal, cfg.gap,
        rgb_root=cfg.rgb_my_data,
    )
    if len(data["ids"]) == 0:
        return data, None
    from ctc_tpu.data.loaders.charades_ctc_next_pred import _extractor

    feats = extract_split_features(
        data, _extractor(cfg),
        os.path.join(cfg.cache, "features_myvideo_ver3"),
        gap=cfg.gap, inputsize=cfg.inputsize,
    )
    data["features"] = np.asarray(feats)
    return data, None
