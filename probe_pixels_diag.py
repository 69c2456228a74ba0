"""Settle the pixels device-time contradiction: 64.4 ms (probe_pixels_tpu)
vs 4.8 ms (sustained probe) for the same conv workload. Times the train
step async-chained and block-per-iteration, for both program variants."""
import time
import numpy as np
import jax, jax.numpy as jnp
from ctc_tpu.models.i3d_lstm import I3DLSTM
from ctc_tpu.train import trainer as tr

B, T, STACK, HW, C = 10, 10, 10, 224, 33
rng0 = np.random.default_rng(0)
model = I3DLSTM(hidden=C, freeze_backbone=True, i3d_dtype=jnp.bfloat16)

def make(Lpaths, len_dtype, tag):
    clips = jnp.asarray(rng0.standard_normal((B, T, STACK, HW, HW, 3)).astype(np.float32))
    batch = {
        "feats": clips,
        "paths": jnp.asarray(rng0.integers(0, C, (B, Lpaths)).astype(np.int32)),
        "input_lengths": jnp.full((B,), T, len_dtype),
        "target_lengths": jnp.full((B,), min(Lpaths, T), len_dtype),
        "future_target": jnp.zeros((B,), jnp.int32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                           clips, train=True)
    state = tr.TrainState.create(params=variables["params"],
                                 batch_stats=variables.get("batch_stats", {}),
                                 tx=tr.torch_style_adam(1e-3))
    step = tr.make_train_step(model, "noblank", implementation="pallas")
    srng = jax.random.PRNGKey(2)
    t0 = time.time()
    state, m = step(state, batch, srng)
    jax.block_until_ready(m["loss"])
    print(f"[{tag}] compile {time.time()-t0:.1f}s loss {float(m['loss']):.4f}", flush=True)
    # uniq clip buffers
    bufs = [dict(batch, feats=batch["feats"] + 1e-3 * k) for k in range(4)]
    jax.block_until_ready([b["feats"] for b in bufs])
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, bufs[i % 4], srng)
    jax.block_until_ready(m["loss"])
    print(f"[{tag}] async uniq-buf: {(time.perf_counter()-t0)/iters*1e3:.1f} ms/step", flush=True)
    losses = []
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, bufs[i % 4], srng)
        jax.block_until_ready(m["loss"])
        losses.append(float(m["loss"]))
    print(f"[{tag}] block-per-iter: {(time.perf_counter()-t0)/iters*1e3:.1f} ms/step "
          f"(losses {losses[:3]}...{losses[-1]:.4f})", flush=True)

make(4, jnp.int32, "probe-style L=4 int32")
# NOTE: without jax x64, jnp.int64 silently downcasts to int32 — the two
# variants differ only in L, not in length dtype (advisor r3)
make(10, jnp.int32, "sustained-style L=10")
