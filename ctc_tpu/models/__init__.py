"""Model zoo: LSTM head over I3D features, and the I3D backbone."""

from ctc_tpu.models.lstm import FeatureHead, LSTMHead, TemporalBatchNorm

__all__ = ["FeatureHead", "LSTMHead", "TemporalBatchNorm"]
