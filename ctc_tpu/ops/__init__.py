"""Lattice math: log-space helpers, emission builders, scan/Pallas DP kernels."""

from ctc_tpu.ops.logspace import NEG_SENTINEL, clamped_log_sigmoid_pair
from ctc_tpu.ops.emissions import (
    gather_log_softmax_emissions,
    binary_ce_emissions,
)
from ctc_tpu.ops.lattice_xla import (
    noblank_lattice_nll,
    noblank_lattice_forward,
)
from ctc_tpu.ops.grad_tools import (
    balance_labels,
    block_gradient,
    equalize_grad_norm,
    verbose_gradients,
)

__all__ = [
    "NEG_SENTINEL",
    "clamped_log_sigmoid_pair",
    "gather_log_softmax_emissions",
    "binary_ce_emissions",
    "noblank_lattice_nll",
    "noblank_lattice_forward",
    "balance_labels",
    "block_gradient",
    "equalize_grad_norm",
    "verbose_gradients",
]
