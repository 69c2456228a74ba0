"""TPU probe: decompose the no-blank forward kernel cost op by op (dev tool).

Builds stripped-down variants of the forward kernel at the bench shape in
tlb layout (slab = (160, tile)) and times each, to locate the binding cost:
DMA/loop floor -> +roll/select -> +logaddexp -> full kernel.
One TPU-claiming python at a time.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_tpu.ops.lattice_pallas import _GRID_SEMANTICS, _widen
from ctc_tpu.ops.logspace import NEG_SENTINEL

print("backend:", jax.default_backend(), flush=True)
jnp.ones((8, 128)).block_until_ready()

T, B, L = 128, 1024, 157
L_PAD, TILE, CHUNK = 160, 128, 16
rng = np.random.default_rng(0)
em = jnp.asarray((rng.standard_normal((T, L, B)) - 1).astype(np.float32))
cells = T * B * L


def make(body_kind):
    def kernel(em_ref, out_ref, carry_ref):
        chunk = em_ref.shape[0]
        slab = out_ref.shape[1:]
        lab0 = jax.lax.broadcasted_iota(jnp.int32, slab, 0) == 0
        pid_t = pl.program_id(1)

        @pl.when(pid_t == 0)
        def _init():
            carry_ref[:] = jnp.where(lab0, 0.0, NEG_SENTINEL).astype(jnp.float32)

        def body(i, alpha):
            t = pid_t * chunk + i
            e = _widen(em_ref[i], L_PAD, 0)
            if body_kind == "copy":
                alpha = e
            elif body_kind == "add":
                alpha = alpha + e
            elif body_kind == "roll":
                s = pltpu.roll(alpha, shift=1, axis=0)
                s = jnp.where(lab0, NEG_SENTINEL, s)
                alpha = jnp.maximum(alpha, s) + e
            elif body_kind == "lse":
                s = pltpu.roll(alpha, shift=1, axis=0)
                s = jnp.where(lab0, NEG_SENTINEL, s)
                alpha = jnp.logaddexp(alpha, s) + e
            elif body_kind == "lse_manual":
                s = pltpu.roll(alpha, shift=1, axis=0)
                s = jnp.where(lab0, NEG_SENTINEL, s)
                mx = jnp.maximum(alpha, s)
                alpha = mx + jnp.log1p(jnp.exp(-jnp.abs(alpha - s))) + e
            elif body_kind == "lse_exp2":
                # exp only (no log1p): m + log(1+e^-d); replace log1p with
                # 2nd-order? just measure exp alone:
                s = pltpu.roll(alpha, shift=1, axis=0)
                s = jnp.where(lab0, NEG_SENTINEL, s)
                mx = jnp.maximum(alpha, s)
                alpha = mx + jnp.exp(-jnp.abs(alpha - s)) + e
            out_ref[i] = alpha
            return alpha

        carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:])

    blk = lambda l: (CHUNK, l, TILE)
    tbl_map = lambda i, j: (j, 0, i)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, L_PAD, B), jnp.float32),
        grid=(B // TILE, T // CHUNK),
        in_specs=[pl.BlockSpec(blk(L), tbl_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk(L_PAD), tbl_map, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L_PAD, TILE), jnp.float32)],
        compiler_params=_GRID_SEMANTICS,
    )


def timed(name, fn, *args, iters=50):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.3f} ms -> {cells/dt:.3e} cells/s", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAILED ({str(e).splitlines()[0][:160]})", flush=True)
        return None


for kind in ("copy", "add", "roll", "lse", "lse_manual", "lse_exp2"):
    timed(kind, jax.jit(make(kind)), em)

# also: no-output variant (write only last row) to split DMA-out cost
def make_noout(body_kind):
    def kernel(em_ref, out_ref, carry_ref):
        chunk = em_ref.shape[0]
        slab = (L_PAD, TILE)
        lab0 = jax.lax.broadcasted_iota(jnp.int32, slab, 0) == 0
        pid_t = pl.program_id(1)

        @pl.when(pid_t == 0)
        def _init():
            carry_ref[:] = jnp.where(lab0, 0.0, NEG_SENTINEL).astype(jnp.float32)

        def body(i, alpha):
            e = _widen(em_ref[i], L_PAD, 0)
            s = pltpu.roll(alpha, shift=1, axis=0)
            s = jnp.where(lab0, NEG_SENTINEL, s)
            alpha = jnp.logaddexp(alpha, s) + e
            return alpha

        carry = jax.lax.fori_loop(0, chunk, body, carry_ref[:])
        carry_ref[:] = carry
        out_ref[0] = carry

    blk = lambda l: (CHUNK, l, TILE)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T // CHUNK, L_PAD, B), jnp.float32),
        grid=(B // TILE, T // CHUNK),
        in_specs=[pl.BlockSpec(blk(L), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, L_PAD, TILE), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L_PAD, TILE), jnp.float32)],
        compiler_params=_GRID_SEMANTICS,
    )

timed("lse_boundary_only_out", jax.jit(make_noout("lse")), em)
