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
    *,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over all (or the given) devices.

    ``data=None`` uses every remaining device on the data axis.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if data is None:
        if total % model:
            raise ValueError(f"{total} devices not divisible by model={model}")
        data = total // model
    if data * model != total:
        devices = devices[: data * model]
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))
