"""Data-parallel scaling-efficiency harness (BASELINE.json: throughput at
1 chip / 1 host / N hosts, >=90% efficiency target).

Measures the full sharded training step (LSTM head + NoBlankCTC + optimizer,
fixed PER-DEVICE batch) at growing mesh sizes over whatever devices exist:
real chips on a pod slice, or the 8-virtual-device CPU mesh as the
correctness/efficiency harness elsewhere (run via run_tests.sh env).
Efficiency(n) = throughput(n) / (n * throughput(1)).

Prints one JSON line per mesh size plus a summary line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.data import synthetic_feature_batches
from ctc_tpu.models import LSTMHead
from ctc_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from ctc_tpu.train.trainer import TrainState, torch_style_adam


def measure(n_devices: int, *, per_device_batch=32, temporal=10,
            feat_dim=1024, num_classes=33, steps=30) -> float:
    mesh = make_mesh(data=n_devices, devices=jax.devices()[:n_devices])
    (batch,) = synthetic_feature_batches(
        num_batches=1, batch_size=per_device_batch * n_devices,
        temporal=temporal, feat_dim=feat_dim, num_classes=num_classes,
    )
    model = LSTMHead(hidden=num_classes)
    feats = jnp.transpose(jnp.asarray(batch["feats"]), (1, 0, 2))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, train=True,
    )
    state = TrainState.create(
        params=replicate(variables["params"], mesh),
        batch_stats=replicate(variables["batch_stats"], mesh),
        tx=torch_style_adam(1e-3),
    )
    step = make_sharded_train_step(model, mesh)
    sharded = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(0)
    state, _ = step(state, sharded, rng)  # compile
    jax.block_until_ready(state.params)
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, sharded, rng)
    jax.block_until_ready(metrics["loss"])
    dt = (time.time() - t0) / steps
    return per_device_batch * n_devices / dt  # samples/s


def main():
    total = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= total]
    results = {}
    for n in sizes:
        thr = measure(n)
        results[n] = thr
        eff = thr / (n * results[1])
        print(json.dumps({
            "mesh_devices": n,
            "samples_per_s": round(thr, 1),
            "efficiency_vs_1": round(eff, 4),
        }), flush=True)
    if len(sizes) > 1:
        last = sizes[-1]
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(results[last] / (last * results[1]), 4),
            "unit": f"fraction at {last} devices",
        }))


if __name__ == "__main__":
    main()
