"""Blank-CTC roofline decomposition (VERDICT r4 weak #2 / next #4).

Decomposes the blank loss's end-to-end step (logits -> nll -> d logits) at
the bench shape T=128, B=1024, C=157, L=20 (S=41 -> l_pad=48) into its
pieces, and sweeps the cheap knobs (batch tile, t-chunk), with the r4
interleaved-A/B protocol: ALL programs run once per rep in alternation,
8 reps, medians compared; 8 distinct input buffers against the pool's
content cache.  One TPU-claiming python.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu import losses
from ctc_tpu.losses.blank import blank_emissions_and_skip
from ctc_tpu.ops.blank_lattice_pallas import blank_lattice_nll_pallas

T, B, C, L = 128, 1024, 157, 20
S2 = 2 * L + 1
REPS, ITERS = 8, 24
rng = np.random.default_rng(0)
targets = jnp.asarray(rng.integers(1, C, size=(B, L)).astype(np.int32))
in_len = jnp.full((B,), T, jnp.int32)
tgt_len = jnp.full((B,), L, jnp.int32)
cells = T * B * S2

logits0 = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
logits_bufs = jax.block_until_ready(
    [logits0 + jnp.float32(1e-6 * k) for k in range(8)]
)


def make_em(x):
    em, skip = blank_emissions_and_skip(
        x, targets, 0, pad_multiple=8, layout="tlb", normalize=True
    )
    return em, skip


em0, skip_ok = jax.jit(make_em)(logits_bufs[0])
em_bufs = jax.block_until_ready(
    [em0 + jnp.float32(1e-6 * k) for k in range(8)]
)

PROGRAMS = {}


def reg(name, fn, bufs):
    PROGRAMS[name] = (jax.jit(fn), bufs)


# --- the e2e step and its tile/chunk variants -------------------------------
def e2e(tiles):
    def f(x):
        em, skip = make_em(x)
        nll = blank_lattice_nll_pallas(
            em, skip, in_len, tgt_len, layout="tlb", tiles=tiles
        )
        return jnp.mean(nll / jnp.maximum(tgt_len, 1).astype(nll.dtype))

    return jax.grad(f)


reg("e2e_auto", e2e(None), logits_bufs)           # auto = tile 512, chunk 16
for tiles in [(256, 16), (128, 16), (512, 32), (512, 8)]:
    reg(f"e2e_t{tiles[0]}_c{tiles[1]}", e2e(tiles), logits_bufs)


# --- pieces -----------------------------------------------------------------
def emission_only(x):
    em, _ = make_em(x)
    return jnp.sum(em)


def emission_only_raw(x):
    em, _ = blank_emissions_and_skip(
        x, targets, 0, pad_multiple=8, layout="tlb", normalize=False
    )
    return jnp.sum(em)


reg("emission_fwd_bwd", jax.grad(emission_only), logits_bufs)
reg("emission_raw_fwd_bwd", jax.grad(emission_only_raw), logits_bufs)


def kernel_only(tiles):
    def f(e):
        nll = blank_lattice_nll_pallas(
            e, skip_ok, in_len, tgt_len, layout="tlb", tiles=tiles
        )
        return jnp.mean(nll / jnp.maximum(tgt_len, 1).astype(nll.dtype))

    return jax.grad(f)


reg("kernel_auto", kernel_only(None), em_bufs)
for tiles in [(256, 16), (128, 16), (512, 32)]:
    reg(f"kernel_t{tiles[0]}_c{tiles[1]}", kernel_only(tiles), em_bufs)


def kernel_fwd(e):
    return jnp.sum(blank_lattice_nll_pallas(
        e, skip_ok, in_len, tgt_len, layout="tlb"
    ))


reg("kernel_fwd_only", kernel_fwd, em_bufs)


def main():
    print("devices:", jax.devices(), flush=True)
    for name, (fn, bufs) in PROGRAMS.items():
        t0 = time.time()
        jax.block_until_ready(fn(bufs[0]))
        print(f"compiled {name} in {time.time() - t0:.1f}s", flush=True)

    times = {name: [] for name in PROGRAMS}
    for rep in range(REPS):
        for name, (fn, bufs) in PROGRAMS.items():
            jax.block_until_ready(fn(bufs[rep % 8]))
            t0 = time.time()
            res = None
            for it in range(ITERS):
                res = fn(bufs[(rep + it) % 8])
            jax.block_until_ready(res)
            times[name].append((time.time() - t0) / ITERS * 1e3)
        print(f"rep {rep}: " + " ".join(
            f"{n}={times[n][-1]:.2f}" for n in times), flush=True)

    result = {"shape": {"T": T, "B": B, "C": C, "L": L, "S": S2},
              "median_ms": {}, "spread_ms": {}}
    for name in times:
        result["median_ms"][name] = round(float(np.median(times[name])), 3)
        result["spread_ms"][name] = [
            round(float(np.min(times[name])), 3),
            round(float(np.max(times[name])), 3),
        ]
    result["e2e_cells_per_s"] = round(
        cells / (result["median_ms"]["e2e_auto"] * 1e-3), 0
    )
    print(json.dumps(result))
    with open("PROBE_BLANK_ROOFLINE.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
