"""A/B: train-step-shaped noblank loss with raw-gather+lse emissions vs
log_softmax-gather emissions, plus the full train step, one process."""
import time
import numpy as np
import jax, jax.numpy as jnp

from ctc_tpu.data import synthetic_feature_batches
from ctc_tpu.models import LSTMHead
from ctc_tpu.train import trainer as tr
from ctc_tpu.ops import dispatch
from ctc_tpu.ops.emissions import _pad_label_rows

B, T, F, C = 256, 10, 1024, 33
(batch,) = synthetic_feature_batches(num_batches=1, batch_size=B, temporal=T,
                                     feat_dim=F, num_classes=C)
batch = {k: jnp.asarray(v) for k, v in batch.items()}
model = LSTMHead(hidden=C)
variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                       jnp.transpose(batch["feats"], (1, 0, 2)), train=True)
state = tr.TrainState.create(params=variables["params"],
                             batch_stats=variables.get("batch_stats", {}),
                             tx=tr.torch_style_adam(1e-3))

def em_new(logits, paths):
    lse = jax.nn.logsumexp(logits, axis=2)
    idx = jnp.mod(paths, C)
    idx_p = _pad_label_rows(idx.T)
    raw = jnp.take_along_axis(logits[:, None, :, :], idx_p[None, :, :, None], axis=3)[..., 0]
    return raw - lse[:, None, :]

def em_old(logits, paths):
    lp = jax.nn.log_softmax(logits, axis=2)
    idx = jnp.mod(paths, C)
    idx_p = _pad_label_rows(idx.T)
    return jnp.take_along_axis(lp[:, None, :, :], idx_p[None, :, :, None], axis=3)[..., 0]

def make_loss_step(em_fn):
    @jax.jit
    def f(logits):
        em = em_fn(logits, batch["paths"])
        nll = dispatch.lattice_nll(em, batch["input_lengths"], batch["target_lengths"],
                                   implementation="pallas", layout="tlb")
        return jnp.mean(nll)
    return jax.jit(jax.grad(f))

logits = jnp.asarray(np.random.default_rng(0).standard_normal((T, B, C)).astype(np.float32))

def timeit(fn, x, iters=50):
    out = fn(x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

for name, em_fn in (("new raw+lse", em_new), ("old log_softmax", em_old)):
    print(name, "loss-only grad:", round(timeit(make_loss_step(em_fn), logits), 3), "ms", flush=True)

step = tr.make_train_step(model, "noblank", implementation="pallas")
rng = jax.random.PRNGKey(2)
state2, m = step(state, batch, rng); jax.block_until_ready(m["loss"])
t0 = time.perf_counter()
for _ in range(50):
    state2, m = step(state2, batch, rng)
jax.block_until_ready(m["loss"])
print("full train step:", round((time.perf_counter()-t0)/50*1e3, 3), "ms", flush=True)
