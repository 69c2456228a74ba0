"""Implementation dispatch for the lattice DP.

``'xla'`` is the pure-``lax.scan`` path (CPU-runnable, used in tests);
``'pallas'`` is the TPU wavefront kernel.  ``None`` picks Pallas on TPU
backends and XLA elsewhere.
"""

from __future__ import annotations

import jax

from ctc_tpu.ops.lattice_xla import noblank_lattice_nll as _xla_nll


def _default_implementation() -> str:
    try:
        backend = jax.default_backend()
    except RuntimeError:  # pragma: no cover - no devices at all
        backend = "cpu"
    return "pallas" if backend == "tpu" else "xla"


def lattice_nll(emissions, input_lengths, target_lengths, *, implementation=None):
    """Per-sample blank-free lattice NLL ``[B]`` from emissions ``[T, B, L]``."""
    if implementation is None:
        implementation = _default_implementation()
    if implementation == "xla":
        return _xla_nll(emissions, input_lengths, target_lengths)
    if implementation == "pallas":
        from ctc_tpu.ops.lattice_pallas import noblank_lattice_nll_pallas

        return noblank_lattice_nll_pallas(emissions, input_lengths, target_lengths)
    raise ValueError(f"unknown lattice implementation {implementation!r}")
