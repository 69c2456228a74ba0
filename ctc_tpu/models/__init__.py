"""Model zoo: LSTM head over I3D features, the I3D backbone, and the legacy
ST-graph energy model."""

from ctc_tpu.models.lstm import FeatureHead, LSTMHead, TemporalBatchNorm
from ctc_tpu.models.i3d import InceptionI3d, Unit3D, InceptionModule, convert_torch_state_dict
from ctc_tpu.models.i3d_lstm import I3DLSTM
from ctc_tpu.models.stgraph import (
    STGraphBase,
    STGraphCriterion,
    MessageStore,
    mean_field_messages,
    winsmooth,
)

__all__ = [
    "FeatureHead",
    "LSTMHead",
    "TemporalBatchNorm",
    "InceptionI3d",
    "Unit3D",
    "InceptionModule",
    "convert_torch_state_dict",
    "I3DLSTM",
    "STGraphBase",
    "STGraphCriterion",
    "MessageStore",
    "mean_field_messages",
    "winsmooth",
]
