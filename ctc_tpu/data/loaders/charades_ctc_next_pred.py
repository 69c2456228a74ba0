"""Charades loader: CSV + frame dirs -> cached windows -> I3D features ->
collated batches (the reference's default train/val dataset, end to end).

Feature source priority:
  1. ``cfg.features_dir`` — precomputed ``features.npy`` per split;
  2. ``cfg.rgb_pretrained_weights`` — a torch I3D checkpoint, converted and
     run frozen over the JPEG windows (cached to ``<cache>/features_<split>``);
  3. randomly initialized I3D (smoke runs only).
"""

from __future__ import annotations

import os

import numpy as np

import jax

from ctc_tpu.data import charades
from ctc_tpu.data.features import I3DFeatureExtractor, extract_split_features
from ctc_tpu.data.loading import (
    collate_verb_ctc,
    collate_binary_ctc,
    collate_joint_ctc,
    host_shard_indices,
)
from ctc_tpu.models.i3d import InceptionI3d, convert_torch_state_dict


def _extractor(cfg):
    model = InceptionI3d()
    if cfg.rgb_pretrained_weights:
        import torch

        state = torch.load(cfg.rgb_pretrained_weights, map_location="cpu")
        variables = convert_torch_state_dict(state)
    else:
        import jax.numpy as jnp

        print(
            "WARNING: --rgb-pretrained-weights not set — extracting "
            "features with a RANDOMLY INITIALIZED I3D backbone. This is "
            "only meaningful for smoke runs; real training needs the "
            "Kinetics checkpoint (reference models/__init__.py:29-31).",
            flush=True,
        )
        dummy = jnp.zeros((1, 1, 10, 224, 224, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy)
    return I3DFeatureExtractor(variables, model)


def _split_batches(cfg, split, csv_file, collate):
    labels = charades.parse_charades_csv(csv_file)
    frame_counts = {
        vid: charades.count_frames(cfg.rgb_data, vid) for vid in labels
    }
    data, _ = charades.cached_prepare(
        cfg.cache, split, labels, frame_counts,
        temporal=cfg.temporal, gap=cfg.gap, num_trans=cfg.num_trans,
        rgb_root=cfg.rgb_data,
    )
    n = len(data["ids"])
    if n == 0:
        return []

    if cfg.features_dir:
        feats = np.load(
            os.path.join(cfg.features_dir, f"features_{split}.npy"),
            mmap_mode="r",
        )
    else:
        feats = extract_split_features(
            data, _extractor(cfg),
            os.path.join(cfg.cache, f"features_{split}"),
            gap=cfg.gap, inputsize=cfg.inputsize,
        )
    batches = []
    for idx in host_shard_indices(
        n, cfg.batch_size,
        process_index=jax.process_index(), process_count=jax.process_count(),
        shuffle=(split == "train"), seed=cfg.manual_seed,
    ):
        batches.append(collate(data, idx, np.asarray(feats[idx])))
    return batches


def get(cfg):
    collate = {
        "binary": collate_binary_ctc,
        "joint": collate_joint_ctc,
    }.get(cfg.loss, collate_verb_ctc)
    train = _split_batches(cfg, "train", cfg.train_file, collate)
    val = _split_batches(cfg, "val", cfg.val_file, collate)
    return train, val


def get_val_video(cfg):
    """val_video split: per-video linspaced windows + gt_table + features
    (the reference's valvideo_loader + gt_table pair,
    datasets/__init__.py:36-44), for :func:`ctc_tpu.eval.video.evaluate_videos`."""
    labels = charades.parse_charades_csv(cfg.val_file)
    frame_counts = {
        vid: charades.count_frames(cfg.rgb_data, vid) for vid in labels
    }
    data, gt_table = charades.cached_prepare(
        cfg.cache, "val_video", labels, frame_counts,
        temporal=cfg.temporal, gap=cfg.gap, num_trans=cfg.num_trans,
        rgb_root=cfg.rgb_data,
    )
    if len(data["ids"]) == 0:
        return data, gt_table
    if cfg.features_dir:
        feats = np.load(
            os.path.join(cfg.features_dir, "features_val_video.npy"),
            mmap_mode="r",
        )
    else:
        feats = extract_split_features(
            data, _extractor(cfg),
            os.path.join(cfg.cache, "features_val_video"),
            gap=cfg.gap, inputsize=cfg.inputsize,
        )
    data["features"] = np.asarray(feats)
    return data, gt_table
