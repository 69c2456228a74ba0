"""One-shot real-TPU validation of the blank-CTC Pallas kernel.

Run with the default env (remote Pallas compile).  Prints parity deltas vs
the XLA scan (loss + logits-grad, on-chip) and fwd+bwd throughput in
lattice cells/s.  TPU-claiming python: never run two at once.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu import losses


def main():
    dev = jax.devices()[0]
    print("device:", dev, "backend:", jax.default_backend())
    # tiny matmul probe (claim check)
    x = jnp.ones((128, 128))
    (x @ x).block_until_ready()
    print("probe matmul ok")

    rng = np.random.default_rng(0)

    # --- parity on-chip: pallas vs xla, loss + grad -------------------
    T, B, C, L = 64, 32, 157, 12
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, C, size=(B, L)).astype(np.int32))
    in_len = jnp.asarray(rng.integers(2 * L + 1, T + 1, size=B))
    tgt_len = jnp.asarray(rng.integers(0, L + 1, size=B))

    def loss_with(impl):
        def f(lg):
            return losses.ctc_loss(
                lg, targets, in_len, tgt_len, reduction="sum",
                implementation=impl,
            )
        return jax.jit(jax.value_and_grad(f))

    v_x, g_x = loss_with("xla")(logits)
    v_p, g_p = loss_with("pallas")(logits)
    dv = abs(float(v_p) - float(v_x)) / max(1.0, abs(float(v_x)))
    dg = float(jnp.max(jnp.abs(g_p - g_x)))
    gref = float(jnp.max(jnp.abs(g_x)))
    print(f"parity: loss rel-delta {dv:.3e}  grad max-abs-delta {dg:.3e} "
          f"(grad scale {gref:.3e})")
    assert dv < 1e-5, "loss parity failed on TPU"
    assert dg < 2e-3 * max(gref, 1.0), "grad parity failed on TPU"

    # --- throughput at a production-ish shape -------------------------
    T, B, C, L = 128, 512, 157, 20
    s_len = 2 * L + 1
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, C, size=(B, L)).astype(np.int32))
    in_len = jnp.full((B,), T, jnp.int32)
    tgt_len = jnp.full((B,), L, jnp.int32)

    results = {}
    for impl in ("pallas", "xla"):
        step = loss_with(impl)
        v, g = step(logits)
        jax.block_until_ready((v, g))
        n_iter = 20
        t0 = time.perf_counter()
        for _ in range(n_iter):
            v, g = step(logits)
        jax.block_until_ready((v, g))
        dt = (time.perf_counter() - t0) / n_iter
        cells = T * B * s_len
        results[impl] = (dt, cells / dt)
        print(f"{impl}: {dt*1e3:.3f} ms/step fwd+bwd at {cells} cells "
              f"-> {cells/dt:.3e} cells/s")
    speedup = results["xla"][0] / results["pallas"][0]
    print(f"pallas speedup over XLA scan on TPU: {speedup:.2f}x")


if __name__ == "__main__":
    main()
