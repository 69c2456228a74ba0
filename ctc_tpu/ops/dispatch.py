"""Implementation dispatch for the lattice DP.

``'xla'`` is the pure-``lax.scan`` path (CPU-runnable, used in tests);
``'pallas'`` is the TPU wavefront kernel.  ``None`` picks Pallas on TPU
backends and XLA elsewhere.

The Pallas kernel's fast layout is ``'tlb'`` (``[T, L, B]``: label-path
positions on sublanes, batch on lanes — ~1.7x faster than ``'tbl'`` at the
production shape because L pads to a multiple of 8 instead of 128).  The
losses build emissions directly in the layout this module resolves, so no
transpose copy is ever paid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctc_tpu.ops.lattice_xla import noblank_lattice_nll as _xla_nll


def _default_implementation() -> str:
    try:
        backend = jax.default_backend()
    except RuntimeError:  # pragma: no cover - no devices at all
        backend = "cpu"
    return "pallas" if backend == "tpu" else "xla"


def resolve_implementation(implementation: str | None) -> str:
    """Resolve ``None`` to the backend default ('pallas' on TPU)."""
    return implementation or _default_implementation()


def preferred_layout(implementation: str | None) -> str:
    """The emission layout the resolved implementation consumes natively."""
    return "tlb" if resolve_implementation(implementation) == "pallas" else "tbl"


def lattice_nll(
    emissions, input_lengths, target_lengths, *, implementation=None,
    layout: str = "tbl", interpret: bool = False,
):
    """Per-sample blank-free lattice NLL ``[B]``.

    ``emissions`` are ``[T, B, L]`` for ``layout='tbl'`` or ``[T, L, B]``
    for ``'tlb'``.  ``interpret`` runs the Pallas kernel in interpret mode
    (CPU parity testing only).
    """
    implementation = resolve_implementation(implementation)
    if implementation == "xla":
        if layout == "tlb":
            emissions = jnp.transpose(emissions, (0, 2, 1))
        return _xla_nll(emissions, input_lengths, target_lengths)
    if implementation == "pallas":
        from ctc_tpu.ops.lattice_pallas import noblank_lattice_nll_pallas

        return noblank_lattice_nll_pallas(
            emissions, input_lengths, target_lengths, layout=layout,
            interpret=interpret,
        )
    raise ValueError(f"unknown lattice implementation {implementation!r}")
