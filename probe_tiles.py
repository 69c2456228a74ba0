"""TPU probe: lattice-kernel layout experiments at the bench shape.
Dev tool, not part of the bench.  One TPU-claiming python at a time.
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
in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
tgt_len = jnp.asarray(np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len)))
cells = T * B * L


def timed(name, fn, *args, iters=50):
    try:
        out = fn(*args)
        (out[0] if isinstance(out, tuple) else out).block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        (out[0] if isinstance(out, tuple) else out).block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt*1e3:.3f} ms -> {cells/dt:.3e} cells/s", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAILED ({str(e).splitlines()[0][:200]})", flush=True)
        return None


fwd_bwd = jax.jit(lambda e: jax.grad(
    lambda x: jnp.sum(lp.noblank_lattice_nll_pallas(x, in_len, tgt_len)))(e))
timed("fwd+bwd", fwd_bwd, em)
timed("fwd-only", jax.jit(
    lambda e: lp.noblank_lattice_nll_pallas(e, in_len, tgt_len)), em)

# numeric cross-check vs XLA path at this shape
from ctc_tpu.ops import lattice_xla
g_pl = fwd_bwd(em)
g_x = jax.jit(lambda e: jax.grad(
    lambda x: jnp.sum(lattice_xla.noblank_lattice_nll(x, in_len, tgt_len)))(e))(em)
err = float(jnp.max(jnp.abs(g_pl - g_x)))
print(f"max |g_pallas - g_xla| = {err:.3e}", flush=True)
