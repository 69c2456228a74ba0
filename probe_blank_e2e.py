"""TPU probe: end-to-end blank-CTC loss (logits -> nll -> d logits).

A/B's the emission chain: (a) current take_along_axis gather (backward =
XLA scatter-add into [T, B, C]); (b) one-hot einsum (MXU both directions).
Also confirms the new tile heuristic end-to-end.  Dev tool; one
TPU-claiming python at a time.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from ctc_tpu import losses
from ctc_tpu.losses.blank import _expand_targets
from ctc_tpu.ops.blank_lattice_pallas import blank_lattice_nll_pallas

print("backend:", jax.default_backend(), flush=True)
x = jnp.ones((128, 128))
print("matmul probe:", float(jnp.sum(x @ x)), flush=True)

T, B, C, L = 128, 1024, 157, 20
S2 = 2 * L + 1
rng = np.random.default_rng(0)
logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
targets = jnp.asarray(rng.integers(1, C, size=(B, L)).astype(np.int32))
in_len = jnp.full((B,), T, jnp.int32)
tgt_len = jnp.full((B,), L, jnp.int32)
cells = T * B * S2

logits_bufs = [logits + jnp.float32(1e-6 * k) for k in range(8)]
logits_bufs = jax.block_until_ready(logits_bufs)


def timed(name, fn, iters=32):
    try:
        for e in logits_bufs[:2]:
            jax.block_until_ready(fn(e))
        t0 = time.time()
        outs = [fn(logits_bufs[i % 8]) for i in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt*1e3:.3f} ms -> {cells/dt:.3e} cells/s", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAILED ({str(e).splitlines()[0][:200]})", flush=True)
        return None


def loss_gather(lg):
    return losses.ctc_loss(lg, targets, in_len, tgt_len, reduction="sum",
                           implementation="pallas")


def emissions_onehot(log_probs, pad_multiple=8):
    z = _expand_targets(jnp.mod(targets, C), 0)
    pad = (-z.shape[1]) % pad_multiple
    if pad:
        z = jnp.pad(z, ((0, 0), (0, pad)), constant_values=0)
    s_len = z.shape[1]
    z_prev2 = jnp.concatenate(
        [jnp.full((B, 2), 0, z.dtype), z[:, :-2]], 1)
    s_idx = jnp.arange(s_len)[None, :]
    skip_ok = (s_idx >= 2) & (z != 0) & (z != z_prev2)
    onehot = jax.nn.one_hot(z, C, dtype=log_probs.dtype)  # [B, S, C]
    em = jnp.einsum("tbc,bsc->tsb", log_probs, onehot)
    return em, skip_ok


def loss_onehot(lg):
    log_probs = jax.nn.log_softmax(lg, axis=2)
    em, skip_ok = emissions_onehot(log_probs)
    nll = blank_lattice_nll_pallas(em, skip_ok, in_len, tgt_len, layout="tlb")
    return jnp.sum(nll)


def loss_xla(lg):
    return losses.ctc_loss(lg, targets, in_len, tgt_len, reduction="sum",
                           implementation="xla")


g_pallas = jax.jit(jax.value_and_grad(loss_gather))  # library path
g_xla = jax.jit(jax.value_and_grad(loss_xla))

# parity of the library pallas path (now one-hot einsum) vs the XLA oracle
(v1, d1) = g_pallas(logits)
(v2, d2) = g_xla(logits)
print(f"loss pallas={float(v1):.6f} xla={float(v2):.6f} "
      f"grad max delta={float(jnp.max(jnp.abs(d1 - d2))):.3e} "
      f"grad scale {float(jnp.max(jnp.abs(d2))):.3e}", flush=True)

timed("e2e pallas (lib) fwd+bwd", g_pallas)
timed("e2e xla          fwd+bwd", g_xla)
timed("e2e pallas (lib) fwd", jax.jit(loss_gather))
