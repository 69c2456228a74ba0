"""Blank-CTC: lse-as-final-correction A/B.

Every path through the blank lattice accumulates exactly one emission per
timestep, so the log-softmax normalization is path-independent:
``nll_normalized[b] = nll_raw[b] + sum_{t < T_b} lse[t, b]``.  This probe
A/Bs the production e2e step (em = raw - lse broadcast, kernel on
normalized em) against the correction form (kernel on RAW gathered
emissions, one [T, B] lse reduction added to the final NLL) — the
candidate win is dropping the [T, S, B]-wide lse broadcast-subtract and
letting the lse's VJP skip the rowsum coupling with d_em.
Interleaved A/B, 8 reps; numeric parity asserted first.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.losses.blank import blank_emissions_and_skip
from ctc_tpu.ops.blank_lattice_pallas import blank_lattice_nll_pallas

T, B, C, L = 128, 1024, 157, 20
REPS, ITERS = 8, 24
rng = np.random.default_rng(0)
targets = jnp.asarray(rng.integers(1, C, size=(B, L)).astype(np.int32))
in_len = jnp.full((B,), T, jnp.int32)
tgt_len = jnp.full((B,), L, jnp.int32)
logits0 = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
bufs = jax.block_until_ready(
    [logits0 + jnp.float32(1e-6 * k) for k in range(8)]
)


def loss_prod(x):
    em, skip = blank_emissions_and_skip(
        x, targets, 0, pad_multiple=8, layout="tlb", normalize=True
    )
    nll = blank_lattice_nll_pallas(em, skip, in_len, tgt_len, layout="tlb")
    return jnp.mean(nll / jnp.maximum(tgt_len, 1).astype(nll.dtype))


def loss_corr(x):
    em, skip = blank_emissions_and_skip(
        x, targets, 0, pad_multiple=8, layout="tlb", normalize=False
    )
    nll_raw = blank_lattice_nll_pallas(
        em, skip, in_len, tgt_len, layout="tlb"
    )
    lse = jax.nn.logsumexp(x, axis=2)  # [T, B]
    tmask = jnp.arange(T)[:, None] < in_len[None, :]
    nll = nll_raw + jnp.sum(jnp.where(tmask, lse, 0.0), axis=0)
    return jnp.mean(nll / jnp.maximum(tgt_len, 1).astype(nll.dtype))


def main():
    print("devices:", jax.devices(), flush=True)
    progs = {"prod": jax.jit(jax.value_and_grad(loss_prod)),
             "lsecorr": jax.jit(jax.value_and_grad(loss_corr))}
    outs = {}
    for name, fn in progs.items():
        t0 = time.time()
        outs[name] = jax.block_until_ready(fn(bufs[0]))
        print(f"compiled {name} in {time.time() - t0:.1f}s", flush=True)
    dv = abs(float(outs["prod"][0]) - float(outs["lsecorr"][0]))
    dg = float(jnp.max(jnp.abs(outs["prod"][1] - outs["lsecorr"][1])))
    print(f"parity: value delta {dv:.3e}, grad max delta {dg:.3e}",
          flush=True)

    times = {n: [] for n in progs}
    for rep in range(REPS):
        for name, fn in progs.items():
            jax.block_until_ready(fn(bufs[rep % 8]))
            t0 = time.time()
            res = None
            for it in range(ITERS):
                res = fn(bufs[(rep + it) % 8])
            jax.block_until_ready(res)
            times[name].append((time.time() - t0) / ITERS * 1e3)
        print(f"rep {rep}: " + " ".join(
            f"{n}={times[n][-1]:.2f}" for n in times), flush=True)
    result = {"value_delta": dv, "grad_max_delta": dg, "median_ms": {
        n: round(float(np.median(v)), 3) for n, v in times.items()}}
    result["speedup"] = round(
        result["median_ms"]["prod"] / result["median_ms"]["lsecorr"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
