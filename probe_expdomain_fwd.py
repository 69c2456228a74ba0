"""VERDICT r4 item 6: attack the forward kernel's 1.8x HBM-floor gap.

Hypothesis: the forward's serial chain `alpha = logaddexp(alpha, roll) + em`
pays exp+log1p latency per step that cannot be hidden across steps.  An
EXP-DOMAIN carry turns the chain into add+multiply:

    A' = (A + roll(A)) * E,   E = exp(em)   (precomputable per step —
                                             off the dependence chain)

The probe times three stripped forward kernels with IDENTICAL grid/blocks
(tile=128, chunk=16, tlb layout, bench shape T=128 B=1024 L=157->160):

  A. production log-domain recursion (logaddexp + masks) — the baseline
  B. exp-domain recursion: in-kernel exp(em[i]) each step + add/mul chain
  C. exp-domain with per-chunk renormalization (the correctness-complete
     variant's real cost: per-column max + divide once per 16 steps)

Same-process A/B with alternating input buffers (content-cache defense).
Forward only (the backward is already at its HBM floor, docs/ROOFLINE.md).
TPU-claiming python: run alone.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e13
T, B, L = 128, 1024, 157
L_PAD = 160
TILE, CHUNK = 128, 16
GRID = (B // TILE, T // CHUNK)
_SEM = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary")
)


def fwd_log_kernel(em_ref, outside_ref, alpha_out_ref, carry_ref):
    """Baseline: the production log-domain recursion (tlb slab [L, B])."""
    outside = outside_ref[:] > 0.5
    lab0 = jax.lax.broadcasted_iota(jnp.int32, (L_PAD, TILE), 0) == 0
    pid_t = pl.program_id(1)

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = jnp.where(lab0, 0.0, NEG).astype(carry_ref.dtype)

    def body(i, alpha):
        t = pid_t * CHUNK + i
        shifted = pltpu.roll(alpha, shift=1, axis=0)
        shifted = jnp.where(lab0, NEG, shifted)
        shifted = jnp.where(t > 0, shifted, NEG)
        lse = jnp.logaddexp(alpha, shifted)
        lse = jnp.where(outside, NEG, lse)
        alpha = lse + em_ref[i]
        alpha_out_ref[i] = alpha
        return alpha

    carry_ref[:] = jax.lax.fori_loop(0, CHUNK, body, carry_ref[:])


def fwd_exp_kernel(em_ref, outside_ref, alpha_out_ref, carry_ref):
    """Exp-domain: chain = add+mul; exp(em) is off-chain per-step work."""
    inside = outside_ref[:] <= 0.5
    lab0 = jax.lax.broadcasted_iota(jnp.int32, (L_PAD, TILE), 0) == 0
    pid_t = pl.program_id(1)

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = jnp.where(lab0, 1.0, 0.0).astype(carry_ref.dtype)

    def body(i, a):
        t = pid_t * CHUNK + i
        e = jnp.exp(em_ref[i])  # off the serial chain
        shifted = pltpu.roll(a, shift=1, axis=0)
        shifted = jnp.where(lab0 | (t == 0), 0.0, shifted)
        a = (a + shifted) * e
        a = jnp.where(inside, a, 0.0)
        alpha_out_ref[i] = a
        return a

    carry_ref[:] = jax.lax.fori_loop(0, CHUNK, body, carry_ref[:])


def fwd_exp_renorm_kernel(em_ref, outside_ref, alpha_out_ref, carry_ref):
    """Exp-domain + the full variant's per-chunk renorm cost (per-column
    max over the label axis + divide, once per chunk)."""
    inside = outside_ref[:] <= 0.5
    lab0 = jax.lax.broadcasted_iota(jnp.int32, (L_PAD, TILE), 0) == 0
    pid_t = pl.program_id(1)

    @pl.when(pid_t == 0)
    def _init():
        carry_ref[:] = jnp.where(lab0, 1.0, 0.0).astype(carry_ref.dtype)

    def body(i, a):
        t = pid_t * CHUNK + i
        e = jnp.exp(em_ref[i])
        shifted = pltpu.roll(a, shift=1, axis=0)
        shifted = jnp.where(lab0 | (t == 0), 0.0, shifted)
        a = (a + shifted) * e
        a = jnp.where(inside, a, 0.0)
        alpha_out_ref[i] = a
        return a

    a = jax.lax.fori_loop(0, CHUNK, body, carry_ref[:])
    m = jnp.max(a, axis=0, keepdims=True)  # per batch column
    carry_ref[:] = a / jnp.where(m > 0, m, 1.0)


def build(kernel):
    blk_em = (CHUNK, L_PAD, TILE)
    tbl_map = lambda i, j: (j, 0, i)
    row_map = lambda i, j: (0, i)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, L_PAD, B), jnp.float32),
        grid=GRID,
        in_specs=[
            pl.BlockSpec(blk_em, tbl_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((L_PAD, TILE), row_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk_em, tbl_map, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L_PAD, TILE), jnp.float32)],
        compiler_params=_SEM,
    )


def timeit(fn, bufs, iters=50):
    out = fn(bufs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(bufs[i % len(bufs)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    x = jnp.ones((128, 128))
    (x @ x).block_until_ready()
    print("backend:", jax.default_backend(), flush=True)

    rng = np.random.default_rng(0)
    # em centered slightly negative, like log-softmax gathers; per-column
    # max factored out as the full variant would -> values in [-4, 0]
    em = (rng.standard_normal((T, L_PAD, B)) * 1.5 - 2).clip(-4, 0)
    em = jnp.asarray(em.astype(np.float32))
    tgt = rng.integers(1, L + 1, size=B)
    outside = jnp.asarray(
        (np.arange(L_PAD)[:, None] >= tgt[None, :]).astype(np.float32)
    )
    cells = T * B * L

    for name, kernel in (("log (baseline)", fwd_log_kernel),
                         ("exp-domain", fwd_exp_kernel),
                         ("exp+chunk-renorm", fwd_exp_renorm_kernel)):
        try:
            fn = jax.jit(lambda e, _k=build(kernel): _k(e, outside))
            bufs = [em + 1e-4 * k for k in range(8)]
            jax.block_until_ready(bufs)
            dt_u = timeit(fn, bufs)
            dt_s = timeit(fn, [em])
            dt = max(dt_u, dt_s)
            print(f"{name:20s} {dt*1e3:7.3f} ms fwd "
                  f"(uniq {dt_u*1e3:.3f}, same {dt_s*1e3:.3f}) "
                  f"-> {cells/dt:.3e} cells/s", flush=True)
        except Exception as e:
            print(f"{name:20s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
