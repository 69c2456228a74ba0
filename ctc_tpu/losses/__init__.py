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
from ctc_tpu.losses.joint import joint_ov_ctc_loss
from ctc_tpu.losses.classification import (
    multilabel_cross_entropy,
    cross_entropy,
    bce_with_logits,
)

def _final_step(core):
    """Adapt a final-timestep classification loss to the lattice-loss call
    signature, for the CE-style prediction datasets (charades_ver3 and kin,
    reference datasets/charades_ver3.py:516-526: the target is ONE future
    o/v vector, not a lattice path)."""

    def fn(logits, paths, input_lengths, target_lengths,
           implementation=None, interpret=False):
        del input_lengths, target_lengths, implementation, interpret
        return core(logits[-1], paths)

    return fn


#: loss-kind registry shared by the single-device and sharded train/eval
#: steps (the capability table of reference models/__init__.py:82-86)
LOSS_FNS = {
    "noblank": no_blank_ctc_loss,
    "binary": no_blank_binary_ctc_loss,
    "blank": ctc_loss,
    "joint": joint_ov_ctc_loss,
    "ce": _final_step(cross_entropy),
    "bce": _final_step(bce_with_logits),
    "mlce": _final_step(multilabel_cross_entropy),
}

__all__ = [
    "no_blank_ctc_loss",
    "no_blank_binary_ctc_loss",
    "ctc_loss",
    "joint_ov_ctc_loss",
    "multilabel_cross_entropy",
    "cross_entropy",
    "bce_with_logits",
    "LOSS_FNS",
]
