"""TPU probe: sweep (batch_tile, t_chunk) layouts of the lattice kernels at
the bench shape and print cells/s for each.  Dev tool, not part of the bench.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ctc_tpu.ops.lattice_pallas import noblank_lattice_nll_pallas

print("backend:", jax.default_backend(), flush=True)
x = jnp.ones((128, 128))
print("matmul probe:", float(jnp.sum(x @ x)), flush=True)

T, B, L = 128, 1024, 157
rng = np.random.default_rng(0)
em = jnp.asarray((rng.standard_normal((T, B, L)) - 1).astype(np.float32))
in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
tgt_len = jnp.asarray(np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len)))
cells = T * B * L

configs = [None, (16, 16), (32, 16), (64, 16), (64, 8), (64, 32), (128, 8), (128, 16)]
for tiles in configs:
    try:
        fn = jax.jit(
            lambda e, _t=tiles: jax.grad(
                lambda x: jnp.sum(
                    noblank_lattice_nll_pallas(x, in_len, tgt_len, tiles=_t)
                )
            )(e)
        )
        fn(em).block_until_ready()
        t0 = time.time()
        iters = 50
        for _ in range(iters):
            out = fn(em)
        out.block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"tiles={tiles}: {dt*1e3:.3f} ms -> {cells/dt:.3e} cells/s",
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"tiles={tiles}: FAILED ({msg})", flush=True)
