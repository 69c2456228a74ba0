"""Long-T A/B: boundary-init Pallas kernel shards vs XLA-scan shards.

The seq-parallel pipeline's per-shard work is the product's long-T critical
path; round 4 forfeited the wavefront kernel there (parallel/seq_lattice.py
ran XLA scans per shard by construction).  This measures, on the single
real chip, an emulated 4-shard chain (boundary row handed shard-to-shard
in-program — the same per-shard programs a 4-device seq mesh runs, minus
the ~µs ppermute) in both implementations, fwd+bwd, at the long-T shape
T=1024, B=512, L=157.

Protocol (CLAUDE.md r4): interleaved A/B — alternate programs each rep,
8 reps of 12-iteration async loops over 4 distinct input buffers, compare
medians; same process.  Also times the UNSHARDED Pallas kernel at the full
T as the no-pipeline reference.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

T, B, L, N_SHARDS = 1024, 512, 157, 4
REPS, ITERS, BUFS = 8, 12, 4
T_S = T // N_SHARDS


def build_programs():
    from ctc_tpu.ops import lattice_xla
    from ctc_tpu.ops.lattice_pallas import (
        NEG_SENTINEL,
        boundary_width,
        noblank_lattice_nll_pallas,
        noblank_shard_lattice_pallas,
    )

    rng = np.random.default_rng(0)
    in_len = jnp.asarray(rng.integers(T // 2, T + 1, size=B))
    tgt_len = jnp.asarray(rng.integers(1, L + 1, size=B))
    w = boundary_width(L, "tlb")

    def kernel_chain(em_tlb):
        std_init = (
            jnp.full((B, w), NEG_SENTINEL, jnp.float32).at[:, 0].set(0.0)
        )
        sent = jnp.full((B, w), NEG_SENTINEL, jnp.float32)
        boundary = std_init
        finals = jnp.zeros((B,), jnp.float32)
        for k in range(N_SHARDS):
            stay0 = std_init if k == 0 else boundary
            adv0 = sent if k == 0 else boundary
            f, boundary = noblank_shard_lattice_pallas(
                jax.lax.dynamic_slice(
                    em_tlb, (k * T_S, 0, 0), (T_S, w, B)
                ),
                stay0, adv0, in_len - k * T_S, tgt_len, "tlb", False, None,
            )
            finals = finals + f
        return jnp.sum(-finals)

    def xla_chain(em_tlb):
        # identical chain structure, per-shard lax.scan of the shared step
        em_tbl = jnp.transpose(em_tlb, (0, 2, 1))[:, :, :L]
        outside = jnp.arange(L)[None, :] >= tgt_len[:, None]
        last_pos = jnp.clip(tgt_len - 1, 0, L - 1)[:, None]
        step = lattice_xla.make_noblank_step(outside, in_len, last_pos)
        alpha0 = (
            jnp.full((B, L), NEG_SENTINEL, jnp.float32).at[:, 0].set(0.0)
        )
        finals = jnp.zeros((B,), jnp.float32)
        boundary = alpha0
        for k in range(N_SHARDS):
            em_k = jax.lax.dynamic_slice(
                em_tbl, (k * T_S, 0, 0), (T_S, B, L)
            )
            a_in = alpha0 if k == 0 else boundary
            t_global = k * T_S + jnp.arange(T_S)
            # the step's final is write-once (gated t == inlen-1) — carry
            # it through the shard scans
            (boundary, finals), _ = jax.lax.scan(
                step, (a_in, finals), (t_global, em_k)
            )
        return jnp.sum(-finals)

    def unsharded_kernel(em_tlb):
        return jnp.sum(noblank_lattice_nll_pallas(
            em_tlb, in_len, tgt_len, layout="tlb"
        ))

    programs = {
        "kernel_chain4": jax.jit(jax.grad(kernel_chain)),
        "xla_chain4": jax.jit(jax.grad(xla_chain)),
        "unsharded_kernel": jax.jit(jax.grad(unsharded_kernel)),
    }
    bufs = [
        jnp.asarray(
            (np.random.default_rng(i).standard_normal((T, w, B)) - 1)
            .astype(np.float32)
        )
        for i in range(BUFS)
    ]
    return programs, bufs


def main():
    print("devices:", jax.devices(), flush=True)
    programs, bufs = build_programs()
    # compile + numeric cross-check first
    outs = {}
    for name, fn in programs.items():
        t0 = time.time()
        outs[name] = jax.block_until_ready(fn(bufs[0]))
        print(f"compiled {name} in {time.time() - t0:.1f}s", flush=True)
    d = float(jnp.max(jnp.abs(outs["kernel_chain4"] - outs["xla_chain4"])))
    print(f"grad max delta kernel_chain vs xla_chain: {d:.3e}", flush=True)

    times = {name: [] for name in programs}
    order = list(programs)
    for rep in range(REPS):
        for name in order:  # interleave programs each rep
            fn = programs[name]
            jax.block_until_ready(fn(bufs[rep % BUFS]))  # warm dispatch
            t0 = time.time()
            res = None
            for it in range(ITERS):
                res = fn(bufs[(rep + it) % BUFS])
            jax.block_until_ready(res)
            dt = (time.time() - t0) / ITERS * 1e3
            times[name].append(dt)
        print(f"rep {rep}: " + " ".join(
            f"{n}={times[n][-1]:.2f}ms" for n in order), flush=True)

    cells = T * B * L
    result = {"shape": {"T": T, "B": B, "L": L, "n_shards": N_SHARDS},
              "grad_delta_kernel_vs_xla": d, "median_ms": {},
              "cells_per_s": {}}
    for name in order:
        med = float(np.median(times[name]))
        result["median_ms"][name] = round(med, 3)
        result["cells_per_s"][name] = round(cells / (med * 1e-3), 0)
    result["kernel_speedup_vs_xla"] = round(
        result["median_ms"]["xla_chain4"]
        / result["median_ms"]["kernel_chain4"], 2
    )
    print(json.dumps(result))
    with open("PROBE_SEQ_KERNEL_AB.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
