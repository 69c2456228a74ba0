"""Synthetic dataset loader (CI / smoke runs)."""

from __future__ import annotations

from ctc_tpu.data.synthetic import synthetic_feature_batches


def get(cfg):
    common = dict(
        batch_size=cfg.batch_size,
        temporal=max(cfg.temporal, 2),
        feat_dim=cfg.extract_feat_dim,
        num_classes=cfg.v_class,
        binary=(cfg.loss == "binary"),
    )
    train = synthetic_feature_batches(num_batches=8, seed=cfg.manual_seed, **common)
    val = synthetic_feature_batches(num_batches=2, seed=cfg.manual_seed + 1, **common)
    return train, val
