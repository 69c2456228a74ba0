"""Own-video eval loader, c_class twin (``--my-dataset myvideo_c_class``).

157-class start-time index paths with ``adjust_time=4`` and the frames offset
by 50 (reference /root/reference/datasets/myvideo_c_class.py:298-443), for
blank-CTC models over the combined class space.  Eval convention:
``(data, None)`` with features.
"""

from __future__ import annotations

import os

import numpy as np

from ctc_tpu.data.charades_variants import (
    MYVIDEO_LABELS,
    prepare_myvideo_c_class,
)
from ctc_tpu.data.features import extract_split_features
from ctc_tpu.data.loaders.myvideo import _frame_counts


def get(cfg, labels: dict | None = None):
    labels = labels or MYVIDEO_LABELS
    data = prepare_myvideo_c_class(
        labels, _frame_counts(cfg, labels), cfg.temporal, cfg.gap,
        rgb_root=cfg.rgb_my_data,
    )
    if len(data["ids"]) == 0:
        return data, None
    from ctc_tpu.data.loaders.charades_ctc_next_pred import _extractor

    feats = extract_split_features(
        data, _extractor(cfg),
        os.path.join(cfg.cache, "features_myvideo_c_class"),
        gap=cfg.gap, inputsize=cfg.inputsize,
    )
    data["features"] = np.asarray(feats)
    return data, None
