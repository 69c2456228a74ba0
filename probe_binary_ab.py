"""Diagnose the r3 binary-e2e drift (VERDICT r3 weak #1): README said
0.86 ms, the driver's fresh rerun measured 1.071 ms at the bench shape
(T=128, B=256, L=32, C=157).  Suspects: the `_choose_tiles` batch cap
(r3 added cap=min(512, round_up(B,128)) -> tile 256 here where r2 ran 512)
and the emission einsum layout.

A/B, one process, bench.py's anti-cache protocol (async loop, max of
same-buffer and 8-distinct-buffers):
  * full e2e grad with forced lattice tiles (128/256/512, chunk 16/32)
  * emission-einsum-only grad (isolates the MXU contraction)
  * lattice-only grad from precomputed emissions, same tile set

TPU-claiming python: run alone.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.ops.emissions import binary_ce_emissions
from ctc_tpu.ops.lattice_pallas import noblank_lattice_nll_pallas

T, B, L, C = 128, 256, 32, 157
rng = np.random.default_rng(0)
logits0 = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
paths = jnp.asarray((rng.random((B, L, C)) < 0.1).astype(np.float32))
in_len = jnp.full((B,), T, jnp.int32)
tgt_len = jnp.full((B,), L, jnp.int32)
cells = T * B * L


def timeit(fn, x0, iters=50, n_bufs=8):
    out = fn(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x0)
    jax.block_until_ready(out)
    t_same = (time.perf_counter() - t0) / iters
    bufs = [x0 + 1e-4 * k for k in range(1, n_bufs + 1)]
    jax.block_until_ready(bufs)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(bufs[i % n_bufs])
    jax.block_until_ready(out)
    t_uniq = (time.perf_counter() - t0) / iters
    return max(t_same, t_uniq), t_same, t_uniq


def report(tag, dt, t_same, t_uniq):
    print(f"{tag:34s} {dt*1e3:7.3f} ms/step "
          f"(same {t_same*1e3:7.3f}, uniq {t_uniq*1e3:7.3f}) "
          f"-> {cells/dt:.3e} cells/s", flush=True)


def main():
    x = jnp.ones((128, 128))
    (x @ x).block_until_ready()
    print("backend:", jax.default_backend(), flush=True)

    # 1) the default product path (what bench.py measures)
    from ctc_tpu import losses

    def e2e_default(lg):
        return jax.grad(lambda y: losses.no_blank_binary_ctc_loss(
            y, paths, in_len, tgt_len, reduction="sum"))(lg)

    for rep in range(2):
        dt, a, b = timeit(jax.jit(e2e_default), logits0)
        report(f"e2e default (auto tiles) rep{rep}", dt, a, b)

    # 2) forced lattice tiles through the same e2e chain
    for tile, chunk in ((128, 16), (256, 16), (512, 16), (256, 32),
                        (128, 32)):
        def e2e_tiles(lg, _t=tile, _c=chunk):
            return jax.grad(lambda y: jnp.sum(
                noblank_lattice_nll_pallas(
                    binary_ce_emissions(y, paths, layout="tlb"),
                    in_len, tgt_len, layout="tlb", tiles=(_t, _c))))(lg)
        try:
            dt, a, b = timeit(jax.jit(e2e_tiles), logits0)
            report(f"e2e tiles=({tile},{chunk})", dt, a, b)
        except Exception as e:
            print(f"e2e tiles=({tile},{chunk}) FAILED: {e}", flush=True)

    # 3) emission einsum only (fwd+bwd)
    def em_only(lg):
        return jax.grad(lambda y: jnp.sum(
            binary_ce_emissions(y, paths, layout="tlb")))(lg)

    dt, a, b = timeit(jax.jit(em_only), logits0)
    report("emissions only (tlb)", dt, a, b)

    def em_only_tbl(lg):
        return jax.grad(lambda y: jnp.sum(
            binary_ce_emissions(y, paths, layout="tbl")))(lg)

    dt, a, b = timeit(jax.jit(em_only_tbl), logits0)
    report("emissions only (tbl)", dt, a, b)

    # 4) lattice only from precomputed emissions
    em0 = binary_ce_emissions(logits0, paths, layout="tlb")
    em0 = jax.block_until_ready(em0)
    for tile, chunk in ((128, 16), (256, 16), (512, 16)):
        def lat_only(e, _t=tile, _c=chunk):
            return jax.grad(lambda y: jnp.sum(noblank_lattice_nll_pallas(
                y, in_len, tgt_len, layout="tlb", tiles=(_t, _c))))(e)
        try:
            dt, a, b = timeit(jax.jit(lat_only), em0)
            report(f"lattice only tiles=({tile},{chunk})", dt, a, b)
        except Exception as e:
            print(f"lattice only tiles=({tile},{chunk}) FAILED: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
