"""End-to-end pixels loader (``--dataset charades_pixels``).

The default dataset's windows (charades_ctc_next_pred semantics) batched as
RAW frame clips instead of cached I3D features — for the I3DLSTM end-to-end
model (reference train.py:410-417 pipeline, where every step runs the I3D).
Batch dict: ``feats`` holds ``[B, T, stack, h, w, 3]`` clips; targets follow
``--loss`` exactly like the feature loaders.
"""

from __future__ import annotations

import numpy as np

from ctc_tpu.data import charades
from ctc_tpu.data.loaders._common import LazyBatches, _index_batches
from ctc_tpu.data.loading import collate_binary_ctc, collate_verb_ctc
from ctc_tpu.data.native_loader import load_window_native


def _pixels_collate(base_collate, gap: int, inputsize: int):
    def collate(data, indices, _features):
        idx = list(indices)
        # C++ thread-pool JPEG decode (native/dataloader.cpp) with a PIL
        # fallback inside decode_frames when the shared lib is unavailable
        clips = np.stack([
            load_window_native(
                data["rgb_image_paths"][i], gap, inputsize=inputsize
            )
            for i in idx
        ])
        batch = base_collate(data, idx, np.zeros((len(idx), clips.shape[1], 1),
                                                 np.float32))
        batch["feats"] = clips.astype(np.float32)
        return batch

    return collate


class _NoFeatures:
    """Placeholder indexable passed where feature arrays normally flow."""

    def __getitem__(self, idx):
        return None


def get(cfg):
    base = collate_binary_ctc if cfg.loss == "binary" else collate_verb_ctc
    collate = _pixels_collate(base, cfg.gap, cfg.inputsize)
    out = []
    for split, csv_file in (("train", cfg.train_file), ("val", cfg.val_file)):
        labels = charades.parse_charades_csv(csv_file)
        frame_counts = {
            vid: charades.count_frames(cfg.rgb_data, vid) for vid in labels
        }
        data, _ = charades.cached_prepare(
            cfg.cache, split, labels, frame_counts,
            temporal=cfg.temporal, gap=cfg.gap, num_trans=cfg.num_trans,
            rgb_root=cfg.rgb_data,
        )
        if len(data["ids"]) == 0:
            out.append([])
            continue
        # lazy: clip batches decode on access + prefetch ahead of the device
        out.append(LazyBatches(
            data, _NoFeatures(),
            _index_batches(cfg, len(data["ids"]), split), collate,
        ))
    return out[0], out[1]
