"""Device-mesh construction.

Replaces the reference's gloo ``init_process_group`` + DataParallel/DDP wrap
(/root/reference/models/__init__.py:33-43) with a ``jax.sharding.Mesh``:

* ``data`` axis — clip-batch data parallelism (gradients all-reduced over ICI
  by XLA; the explicit ``lax.psum`` form lives in shard_map steps).
* ``model`` axis — optional; shards the 157-class binary-CTC lattice stack
  (SURVEY.md §2.5 item 2) and any wide layers.

Multi-host: call :func:`init_distributed` first (jax.distributed), then the
mesh spans all hosts' devices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper (multi-host; no-op if single)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    data: int | None = None,
    model: int = 1,
    seq: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` or ``(data, seq)`` mesh.

    ``data=None`` uses every remaining device on the data axis.  ``model``
    > 1 adds the class-sharding axis for the binary lattice stack;
    ``seq`` > 1 adds the T-pipeline axis instead (SURVEY.md §5.7) — the two
    second axes are alternatives, not combinable (no capability needs a
    3-axis lattice).
    """
    if model > 1 and seq > 1:
        raise ValueError("pick one second axis: model or seq, not both")
    second = max(model, seq)
    second_name = SEQ_AXIS if seq > 1 else MODEL_AXIS
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if data is None:
        if total % second:
            raise ValueError(
                f"{total} devices not divisible by {second_name}={second}"
            )
        data = total // second
    if data * second != total:
        devices = devices[: data * second]
    return Mesh(devices.reshape(data, second), (DATA_AXIS, second_name))
