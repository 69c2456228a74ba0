"""One-shot pixels-mode (I3DLSTM) TPU run: a measured full train step at the
reference's documented clip geometry (train.py:366: input
[B=10, T=10, stack=10, 224, 224, 3]), bf16 convs, frozen backbone (the
reference's live config).  TPU-claiming python: one at a time.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.models.i3d_lstm import I3DLSTM
from ctc_tpu.train import trainer as tr


def main():
    print("device:", jax.devices()[0], flush=True)
    x = jnp.ones((128, 128))
    (x @ x).block_until_ready()
    print("probe ok", flush=True)

    B, T, STACK, HW, C = 10, 10, 10, 224, 33
    L = 4
    rng = np.random.default_rng(0)
    model = I3DLSTM(hidden=C, freeze_backbone=True, i3d_dtype=jnp.bfloat16)
    clips = jnp.asarray(
        rng.standard_normal((B, T, STACK, HW, HW, 3)).astype(np.float32)
    )
    batch = {
        "feats": clips,
        "paths": jnp.asarray(rng.integers(0, C, (B, L)).astype(np.int32)),
        "input_lengths": jnp.full((B,), T, jnp.int32),
        "target_lengths": jnp.full((B,), L, jnp.int32),
        "future_target": jnp.zeros((B,), jnp.int32),
    }
    t0 = time.time()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        clips, train=True,
    )
    print(f"init ok ({time.time()-t0:.1f}s)", flush=True)
    state = tr.TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tr.torch_style_adam(1e-3),
    )
    step = tr.make_train_step(model, "noblank", implementation="pallas")
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics["loss"])
    print(f"first step (compile) {time.time()-t0:.1f}s, "
          f"loss {float(metrics['loss']):.4f}", flush=True)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics["loss"])
    dt = (time.time() - t0) / iters
    print(f"pixels train step: {dt*1e3:.1f} ms/step at B={B} clips "
          f"(T={T} x stack={STACK} x {HW}x{HW}) -> {B/dt:.1f} clips-of-"
          f"{T}-windows/s, loss {float(metrics['loss']):.4f}", flush=True)
    try:
        stats = jax.local_devices()[0].memory_stats()
        print(f"peak HBM: {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
              f"of {stats.get('bytes_limit', 0)/2**30:.2f} GiB", flush=True)
    except Exception as e:
        print(f"memory_stats unavailable ({e})", flush=True)


if __name__ == "__main__":
    main()
