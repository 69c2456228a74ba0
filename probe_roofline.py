"""TPU probe: what binds the no-blank lattice kernel? (dev tool)

Measures at the bench shape (T=128, B=1024, L=157):
  * fwd+bwd / fwd-only, both layouts, a few tile configs
  * the HBM streaming floor (copy of an alpha-sized array)
One TPU-claiming python at a time.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from ctc_tpu.ops import lattice_pallas as lp

print("backend:", jax.default_backend(), flush=True)
x = jnp.ones((128, 128))
print("matmul probe:", float(jnp.sum(x @ x)), flush=True)

T, B, L = 128, 1024, 157
rng = np.random.default_rng(0)
em = jnp.asarray((rng.standard_normal((T, B, L)) - 1).astype(np.float32))
em_tlb = jnp.transpose(em, (0, 2, 1)).copy()
in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
tgt_len = jnp.asarray(np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len)))
cells = T * B * L


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


# HBM streaming floor: copy an alpha-sized array (tlb padded: [128,160,1024])
alpha_like = jnp.zeros((128, 160, 1024), jnp.float32)
nbytes = alpha_like.size * 4
cp = jax.jit(lambda a: a + 1.0)
cp(alpha_like).block_until_ready()
t0 = time.perf_counter()
for _ in range(50):
    out = cp(alpha_like)
out.block_until_ready()
dt = (time.perf_counter() - t0) / 50
print(f"HBM stream (read+write {2*nbytes/1e6:.0f} MB): {dt*1e3:.3f} ms "
      f"-> {2*nbytes/dt/1e9:.0f} GB/s", flush=True)

for layout, e in (("tbl", em), ("tlb", em_tlb)):
    for tiles in (None, (128, 16), (256, 16), (256, 8), (512, 8)):
        tag = f"{layout} tiles={tiles}"
        fb = jax.jit(lambda x, _t=tiles, _l=layout: jax.grad(
            lambda y: jnp.sum(lp.noblank_lattice_nll_pallas(
                y, in_len, tgt_len, layout=_l, tiles=_t)))(x))
        f = jax.jit(lambda x, _t=tiles, _l=layout: lp.noblank_lattice_nll_pallas(
            x, in_len, tgt_len, layout=_l, tiles=_t))
        d1 = timed(f"fwd+bwd {tag}", fb, e)
        d2 = timed(f"fwd     {tag}", f, e)
        if d1 and d2:
            print(f"   -> bwd ~ {1e3*(d1-d2):.3f} ms", flush=True)
