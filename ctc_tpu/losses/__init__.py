"""Public loss API.

Functional equivalents of the reference's loss modules:

* :func:`no_blank_ctc_loss`        — /root/reference/NoBlankCTC.py
* :func:`no_blank_binary_ctc_loss` — /root/reference/NoBlankBinaryCTC.py
* :func:`multilabel_cross_entropy` — /root/reference/CrossEntropy.py
* :func:`ctc_loss` (standard blank CTC + :mod:`ctc_tpu.decode`) — the
  torch.nn.CTCLoss usage at /root/reference/models/layers/AsyncTFCriterion.py:198
* :func:`cross_entropy` / :func:`bce_with_logits` — the stock torch losses
  instantiated at /root/reference/models/__init__.py:85-86
"""

from ctc_tpu.losses.noblank import (
    no_blank_ctc_loss,
    no_blank_binary_ctc_loss,
)
from ctc_tpu.losses.blank import ctc_loss
from ctc_tpu.losses.classification import (
    multilabel_cross_entropy,
    cross_entropy,
    bce_with_logits,
)

__all__ = [
    "no_blank_ctc_loss",
    "no_blank_binary_ctc_loss",
    "ctc_loss",
    "multilabel_cross_entropy",
    "cross_entropy",
    "bce_with_logits",
]
