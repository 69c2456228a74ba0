"""One-shot pixels-mode (I3DLSTM) TPU run: a measured full train step at the
reference's documented clip geometry (train.py:366: input
[B=10, T=10, stack=10, 224, 224, 3]), bf16 convs, frozen backbone (the
reference's live config).  TPU-claiming python: one at a time.

``--batch N`` overrides the clip batch (B=10 badly underfeeds a v5e — the
batch-scaling evidence for docs/PIXELS.md).  ``--mfu`` additionally lowers
the step on the CPU backend to pull XLA's analytical FLOP count and report
model FLOP utilization against the v5e bf16 peak (197 TFLOP/s).

Run under nohup with a log file (first remote compile of the conv graph is
~9 min; a foreground timeout that kills it wedges the TPU claim).
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.models.i3d_lstm import I3DLSTM
from ctc_tpu.train import trainer as tr

V5E_BF16_PEAK = 197e12  # FLOP/s, one v5e chip


def flops_per_step(model, batch, example_rng):
    """XLA's analytical FLOP count for ONE jitted train step (fwd+bwd+Adam).

    Lowered for the current backend; cost analysis is backend-agnostic HLO
    arithmetic counting (bf16 convs count one FLOP per MAC-half like f32).
    """
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["feats"], train=True,
    )
    state = tr.TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tr.torch_style_adam(1e-3),
    )
    step = tr.make_train_step(model, "noblank", implementation="xla")
    lowered = step.lower(state, batch, example_rng)  # trace only, no compile
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mfu", action="store_true",
                    help="compute the analytical FLOP count / MFU")
    ap.add_argument("--chunk", type=int, default=0,
                    help="I3DLSTM feat_chunk: extract features in chunks "
                         "of this many folded clips (bounds HBM)")
    ap.add_argument("--flops-per-step", type=float, default=0.0,
                    help="inject the analytical FLOP count (the axon TPU "
                         "client returns None from cost_analysis; compute "
                         "it with the CPU client: lower the same step "
                         "under JAX_PLATFORMS=cpu on ShapeDtypeStructs)")
    args = ap.parse_args()

    print("device:", jax.devices()[0], flush=True)
    x = jnp.ones((128, 128))
    (x @ x).block_until_ready()
    print("probe ok", flush=True)

    B, T, STACK, HW, C = args.batch, 10, 10, 224, 33
    L = 4
    rng = np.random.default_rng(0)
    model = I3DLSTM(hidden=C, freeze_backbone=True, i3d_dtype=jnp.bfloat16,
                    feat_chunk=args.chunk)
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
    flops = args.flops_per_step or None
    if args.mfu and flops is None:
        try:
            flops = flops_per_step(model, batch, jax.random.PRNGKey(2))
        except Exception as e:
            print(f"cost analysis unavailable ({e}); pass "
                  f"--flops-per-step from a CPU-client lowering", flush=True)
    if flops:
        print(f"analytical FLOPs/step: {flops:.3e} "
              f"({flops/B:.3e} per clip)", flush=True)
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

    t0 = time.time()
    for _ in range(args.iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics["loss"])
    dt = (time.time() - t0) / args.iters
    out = {"batch": B, "ms_per_step": dt * 1e3, "clips_per_s": B / dt,
           "geometry": f"T={T} x stack={STACK} x {HW}x{HW}"}
    print(f"pixels train step: {dt*1e3:.1f} ms/step at B={B} clips "
          f"(T={T} x stack={STACK} x {HW}x{HW}) -> {B/dt:.1f} clips-of-"
          f"{T}-windows/s, loss {float(metrics['loss']):.4f}", flush=True)
    if flops:
        out["flops_per_step"] = flops
        out["mfu_vs_bf16_peak"] = flops / dt / V5E_BF16_PEAK
        print(f"MFU: {flops/dt:.3e} FLOP/s = "
              f"{100*flops/dt/V5E_BF16_PEAK:.1f}% of v5e bf16 peak",
              flush=True)
    try:
        stats = jax.local_devices()[0].memory_stats()
        out["peak_hbm_gib"] = stats.get("peak_bytes_in_use", 0) / 2**30
        print(f"peak HBM: {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
              f"of {stats.get('bytes_limit', 0)/2**30:.2f} GiB", flush=True)
    except Exception as e:
        print(f"memory_stats unavailable ({e})", flush=True)
    print("JSON:", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
