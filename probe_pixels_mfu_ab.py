"""VERDICT r4 item 7: falsify or confirm docs/PIXELS.md's claim that the
flat 21-27% pixels MFU is "the expected band" for Inception-v1 conv shapes
(MXU underfill).

Counter-hypothesis from the CPU-client jaxpr audit: the un-fused
intermediate total at B=10 is ~40 GB -> a 49 ms HBM floor vs the 64 ms
measured, while the conv-only activation traffic (6.6 GB, 8 ms) and the
MXU floor (15.1 ms) are both far below it — i.e. the step may be
activation-traffic-bound, not conv-shape-bound.

Experiment: A/B the full train step at B=10 with inter-layer activations
f32 (production default) vs bf16 (`InceptionI3d(act_dtype=bf16)` — halves
activation bytes between layers).  If bf16 activations move the step
materially, the band is traffic-bound and the r3 explanation is wrong.

Interleaved 6-rep median protocol, distinct clip buffers (content-cache
defense).  TPU-claiming python: run alone; expect a fresh multi-minute
remote compile for the bf16-act variant.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.models.i3d_lstm import I3DLSTM
from ctc_tpu.train import trainer as tr

B, T, STACK, HW, C = 10, 10, 10, 224, 33
FLOPS_PER_CLIP = 2.982e11  # CPU-client analytical count (BENCH_PIXELS.json)
PEAK = 197e12


def build(act_dtype):
    model = I3DLSTM(hidden=C, freeze_backbone=True, i3d_dtype=jnp.bfloat16,
                    i3d_act_dtype=act_dtype)
    rng0 = np.random.default_rng(0)
    clips = jnp.asarray(
        rng0.standard_normal((B, T, STACK, HW, HW, 3)).astype(np.float32)
    )
    batch = {
        "feats": clips,
        "paths": jnp.asarray(rng0.integers(0, C, (B, T)).astype(np.int32)),
        "input_lengths": jnp.full((B,), T, jnp.int32),
        "target_lengths": jnp.full((B,), 4, jnp.int32),
        "future_target": jnp.zeros((B,), jnp.int32),
    }
    t0 = time.time()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        clips, train=True,
    )
    print(f"init({act_dtype.__name__}) {time.time()-t0:.0f}s", flush=True)
    state = tr.TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tr.torch_style_adam(1e-3),
    )
    step = tr.make_train_step(model, "noblank", implementation="pallas")
    return step, state, batch


def main():
    x = jnp.ones((128, 128))
    (x @ x).block_until_ready()
    print("backend:", jax.default_backend(), flush=True)

    runs = {}
    for act in (jnp.float32, jnp.bfloat16):
        step, state, batch = build(act)
        bufs = [dict(batch, feats=batch["feats"] + 1e-3 * k)
                for k in range(8)]
        jax.block_until_ready([b["feats"] for b in bufs])
        rng = jax.random.PRNGKey(2)
        t0 = time.time()
        state, m = step(state, bufs[0], rng)
        jax.block_until_ready(m["loss"])
        print(f"compile({act.__name__}) {time.time()-t0:.0f}s "
              f"loss {float(m['loss']):.4f}", flush=True)
        runs[act.__name__] = (step, state, bufs, rng)

    iters = 10
    times = {k: [] for k in runs}
    for rep in range(6):
        for name, (step, state, bufs, rng) in runs.items():
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = step(state, bufs[i % 8], rng)
            jax.block_until_ready(m["loss"])
            times[name].append((time.perf_counter() - t0) / iters * 1e3)
            runs[name] = (step, state, bufs, rng)
    for name, ts in times.items():
        med = float(np.median(ts))
        mfu = FLOPS_PER_CLIP * B / (med / 1e3) / PEAK
        print(f"act={name:9s} median {med:.1f} ms/step -> "
              f"{B/(med/1e3):.0f} clips/s, MFU {mfu*100:.1f}%  "
              f"all {[round(t, 1) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
