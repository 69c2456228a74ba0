"""Shared split pipeline for the Charades-variant registry loaders.

Every variant loader runs the same skeleton (reference
datasets/__init__.py:11-44 + each variant's ``get()``): parse CSV → frame
counts → variant ``prepare`` → I3D features (precomputed via
``--features-dir`` or extracted+cached) → host-sharded index batches →
variant collate.  Only the prepare function, feature cache key, and collate
differ per variant.
"""

from __future__ import annotations

import os

import numpy as np

import jax

from ctc_tpu.data import charades as charades_data
from ctc_tpu.data.features import extract_split_features
from ctc_tpu.data.loading import host_shard_indices


def prepared_split(cfg, csv_file, prepare):
    """Parse the annotation CSV and run a variant ``prepare(labels,
    frame_counts)``; returns ``(labels, data)``."""
    labels = charades_data.parse_charades_csv(csv_file)
    frame_counts = {
        vid: charades_data.count_frames(cfg.rgb_data, vid) for vid in labels
    }
    return labels, prepare(labels, frame_counts)


def split_features(cfg, data, cache_key: str, split: str) -> np.ndarray:
    """``[N, T, F]`` clip features for a prepared split.

    ``cfg.features_dir`` set -> load ``<features_dir>/<cache_key>_<split>.npy``
    (BASELINE config 4 cached-features mode; missing file is an error, not a
    silent re-extraction).  Otherwise run the frozen I3D extractor, cached
    under ``<cfg.cache>/<cache_key>_<split>``.
    """
    if cfg.features_dir:
        path = os.path.join(cfg.features_dir, f"{cache_key}_{split}.npy")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"--features-dir is set but {path} does not exist"
            )
        return np.load(path, mmap_mode="r")
    from ctc_tpu.data.loaders.charades_ctc_next_pred import _extractor

    return extract_split_features(
        data, _extractor(cfg),
        os.path.join(cfg.cache, f"{cache_key}_{split}"),
        gap=cfg.gap, inputsize=cfg.inputsize,
    )


def _index_batches(cfg, n: int, split: str) -> list:
    return host_shard_indices(
        n, cfg.batch_size,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        shuffle=(split == "train"), seed=cfg.manual_seed,
    )


def shard_and_collate(cfg, data, feats, split: str, collate) -> list:
    return [
        collate(data, idx, np.asarray(feats[idx]))
        for idx in _index_batches(cfg, len(data["ids"]), split)
    ]


class LazyBatches:
    """List-like of batches collated on access.

    The TPU-native replacement for the reference's DataLoader worker pool
    (datasets/__init__.py:28-42) on the raw-pixels path: a materialized list
    of clip batches would not fit host RAM at dataset scale, so collation
    (JPEG decode + preprocess) happens per batch, and iteration overlaps it
    with device steps via a background-thread :class:`Prefetcher`.
    """

    def __init__(self, data, feats, index_batches, collate, *,
                 prefetch_depth: int = 2):
        self._data = data
        self._feats = feats
        self._index_batches = index_batches
        self._collate = collate
        self._depth = prefetch_depth

    def __len__(self):
        return len(self._index_batches)

    def __getitem__(self, i):
        idx = self._index_batches[i]
        return self._collate(self._data, idx, self._feats[idx])

    def __iter__(self):
        from ctc_tpu.data.loading import Prefetcher

        return iter(Prefetcher(
            lambda: (self[i] for i in range(len(self))), depth=self._depth
        ))


def split_batches(cfg, split: str, csv_file, prepare, cache_key: str,
                  collate) -> list:
    """The full skeleton for one split; returns collated batch dicts."""
    _, data = prepared_split(cfg, csv_file, prepare)
    if len(data["ids"]) == 0:
        return []
    feats = split_features(cfg, data, cache_key, split)
    return shard_and_collate(cfg, data, feats, split, collate)


def filter_samples(data: dict, keep) -> dict:
    """Keep only the samples at indices ``keep`` across every field list."""
    keep = list(keep)
    return {k: [v[i] for i in keep] for k, v in data.items()}
