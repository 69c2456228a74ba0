"""Data layer: Charades parsing/windowing, synthetic generators, loading."""

from ctc_tpu.data.synthetic import synthetic_feature_batches

__all__ = ["synthetic_feature_batches"]
