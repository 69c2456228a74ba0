"""Benchmark: CTC-family lattice throughput (fwd+bwd) on one TPU chip vs
the eager PyTorch reference DP loop (the BASELINE.json denominator).

Prints exactly ONE JSON line on stdout (the headline no-blank metric):
  {"metric": "lattice_cells_per_s", "value": <ours>, "unit": "cells/s",
   "vs_baseline": <ours / eager-pytorch-reference>}

All measured metrics (no-blank Pallas, no-blank XLA-on-same-backend, binary
NoBlankBinaryCTC end-to-end, blank CTC) are additionally written to
``BENCH_DETAILS.json``.  Details go to stderr.

Timing methodology: async dispatch loops (block at the end), each protocol
(one reused buffer / 8 distinct buffers, the latter defeating the remote
pool's content-addressed result cache) run as 5 repeated loops with the
MEDIAN loop average reported; the headline is the slower of the two medians
(caching can only deflate).  Chained data-dependent timing was evaluated
and rejected: each chain link round-trips the 80 MB operand through the
tunnel host, measuring transfer, not the kernel.

The reference numbers come from running the GENUINE reference
implementation (/root/reference/NoBlankCTC.py, ``.cuda()`` no-op'd) at its
documented config (B=10, T=10, L=10, C=33 — ctc_exe.py / opts.py defaults),
forward+backward, on this host.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _loop(fn, bufs, iters):
    import jax

    out = fn(bufs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(bufs[i % len(bufs)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def measure(grad_fn, x0, iters=50, n_bufs=8, reps=5):
    """Seconds/step of grad_fn: (headline, same_buffer, distinct_buffers).

    Each protocol (same-buffer / distinct-buffers) runs ``reps`` loops and
    reports the MEDIAN loop average: single 50-iter loops of the identical
    program have measured 0.8-2.2 ms within one session on this backend
    (remote-pool scheduling), so a one-loop number is a lottery ticket
    (round-3's "binary drift" was part regression, part exactly this).
    The headline is the slower of the two medians (content caching can
    only deflate the same-buffer run).
    """
    import jax

    fn = jax.jit(grad_fn)
    bufs = [x0 + 1e-4 * k for k in range(1, n_bufs + 1)]
    jax.block_until_ready(bufs)
    same_ts, uniq_ts = [], []
    _loop(fn, [x0], 2)  # compile + warm
    for _ in range(reps):
        same_ts.append(_loop(fn, [x0], iters))
        uniq_ts.append(_loop(fn, bufs, iters))
    del bufs
    t_same = float(np.median(same_ts))
    t_uniq = float(np.median(uniq_ts))
    return max(t_same, t_uniq), t_same, t_uniq


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


def bench_noblank(backend: str) -> dict:
    """Raw no-blank lattice fwd+bwd from emissions: Pallas vs XLA."""
    import jax
    import jax.numpy as jnp

    from ctc_tpu.ops import dispatch

    T, B, L = 128, 1024, 157  # production-scale parity shape (BASELINE.json)
    rng = np.random.default_rng(0)
    em = jnp.asarray((rng.standard_normal((T, L, B)) - 1).astype(np.float32))
    # the production losses emit the label axis padded to the sublane
    # multiple (aligned kernel DMA, no in-VMEM widen) — feed the kernel the
    # same; cells counted are the L real ones.
    em_pad = jnp.pad(em, ((0, 0), (0, (-L) % 8), (0, 0)))
    in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
    tgt_len = jnp.asarray(
        np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len))
    )
    cells = T * B * L

    impls = ["pallas", "xla"] if backend == "tpu" else ["xla"]
    out = {}
    for impl in impls:
        def grad_fn(e, _impl=impl):
            return jax.grad(
                lambda x: jnp.sum(
                    dispatch.lattice_nll(
                        x, in_len, tgt_len, implementation=_impl, layout="tlb"
                    )
                )
            )(e)

        try:
            dt, t_same, t_uniq = measure(
                grad_fn, em_pad if impl == "pallas" else em
            )
        except Exception as e:  # pragma: no cover - kernel compile failure
            _log(f"noblank[{impl}] failed to compile ({e}); skipping")
            continue
        _log(f"noblank[{impl} on {backend}]: {dt*1e3:.3f} ms/step fwd+bwd "
             f"(same-buf {t_same*1e3:.3f}, uniq-buf {t_uniq*1e3:.3f}) at "
             f"{cells} cells -> {cells/dt:.3e} cells/s")
        out[impl] = {"ms_per_step": dt * 1e3, "cells_per_s": cells / dt,
                     "shape": {"T": T, "B": B, "L": L}}
    return out


def bench_binary_e2e(backend: str) -> dict | None:
    """NoBlankBinaryCTC end-to-end: BCE emission einsum over C=157 classes +
    lattice + chain rule back to logits (the reference's flagship loss,
    /root/reference/NoBlankBinaryCTC.py:108-121)."""
    import jax
    import jax.numpy as jnp

    from ctc_tpu import losses

    T, B, L, C = 128, 256, 32, 157
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    paths = jnp.asarray((rng.random((B, L, C)) < 0.1).astype(np.float32))
    in_len = jnp.full((B,), T, jnp.int32)
    tgt_len = jnp.full((B,), L, jnp.int32)
    cells = T * B * L

    def grad_fn(lg):
        return jax.grad(
            lambda x: losses.no_blank_binary_ctc_loss(
                x, paths, in_len, tgt_len, reduction="sum"
            )
        )(lg)

    try:
        dt, t_same, t_uniq = measure(grad_fn, logits)
    except Exception as e:  # pragma: no cover
        _log(f"binary e2e failed ({e}); skipping")
        return None
    _log(f"binary e2e [{backend}]: {dt*1e3:.3f} ms/step fwd+bwd at "
         f"{cells} lattice cells x {C} classes -> {cells/dt:.3e} cells/s "
         f"({cells*C/dt:.3e} class-cells/s)")
    return {"ms_per_step": dt * 1e3, "cells_per_s": cells / dt,
            "class_cells_per_s": cells * C / dt,
            "shape": {"T": T, "B": B, "L": L, "C": C}}


def bench_blank(backend: str) -> dict | None:
    """Standard blank CTC (torch.nn.CTCLoss capability) fwd+bwd."""
    import jax
    import jax.numpy as jnp

    from ctc_tpu import losses

    T, B, C, L = 128, 1024, 157, 20
    s_len = 2 * L + 1
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, C, size=(B, L)).astype(np.int32))
    in_len = jnp.full((B,), T, jnp.int32)
    tgt_len = jnp.full((B,), L, jnp.int32)
    cells = T * B * s_len

    def grad_fn(lg):
        return jax.grad(
            lambda x: losses.ctc_loss(
                x, targets, in_len, tgt_len, reduction="sum"
            )
        )(lg)

    try:
        dt, t_same, t_uniq = measure(grad_fn, logits)
    except Exception as e:  # pragma: no cover
        _log(f"blank CTC bench failed ({e}); skipping")
        return None
    _log(f"blank CTC [{backend}]: {dt*1e3:.3f} ms/step fwd+bwd at {cells} "
         f"cells -> {cells/dt:.3e} cells/s")
    return {"ms_per_step": dt * 1e3, "cells_per_s": cells / dt,
            "shape": {"T": T, "B": B, "C": C, "L": L, "S": s_len}}


def bench_seq_kernel(backend: str) -> dict | None:
    """Long-T seq-parallel critical path: the boundary-init Pallas kernel
    shards (ops/lattice_pallas.py::noblank_shard_lattice_pallas) chained
    into an emulated 4-shard pipeline at T=1024, B=512, L=157, fwd+bwd —
    the per-shard programs a 4-device seq mesh runs (minus the ~µs
    ppermute).  Skipped off-TPU."""
    import jax
    import jax.numpy as jnp

    if backend != "tpu":
        return None
    from ctc_tpu.ops.lattice_pallas import (
        NEG_SENTINEL,
        boundary_width,
        noblank_shard_lattice_pallas,
    )

    T, B, L, n = 1024, 512, 157, 4
    t_s = T // n
    w = boundary_width(L, "tlb")
    rng = np.random.default_rng(0)
    in_len = jnp.asarray(rng.integers(T // 2, T + 1, size=B))
    tgt_len = jnp.asarray(rng.integers(1, L + 1, size=B))
    em = jnp.asarray(
        (rng.standard_normal((T, w, B)) - 1).astype(np.float32)
    )

    def chain(em_tlb):
        std_init = (
            jnp.full((B, w), NEG_SENTINEL, jnp.float32).at[:, 0].set(0.0)
        )
        sent = jnp.full((B, w), NEG_SENTINEL, jnp.float32)
        boundary = None  # bound by shard 0's call; never read before
        finals = jnp.zeros((B,), jnp.float32)
        for k in range(n):
            f, boundary = noblank_shard_lattice_pallas(
                jax.lax.dynamic_slice(em_tlb, (k * t_s, 0, 0), (t_s, w, B)),
                std_init if k == 0 else boundary,
                sent if k == 0 else boundary,
                in_len - k * t_s, tgt_len, "tlb", False, None,
            )
            finals = finals + f
        return jnp.sum(-finals)

    grad_fn = jax.jit(jax.grad(chain))
    cells = T * B * L
    try:
        dt, t_same, t_uniq = measure(grad_fn, em, iters=20, n_bufs=4,
                                     reps=4)
    except Exception as e:  # pragma: no cover
        _log(f"seq-kernel bench failed ({e}); skipping")
        return None
    _log(f"seq kernel chain [{backend}]: {dt*1e3:.3f} ms/step fwd+bwd at "
         f"{cells} cells over {n} emulated shards -> {cells/dt:.3e} cells/s")
    return {"ms_per_step": dt * 1e3, "cells_per_s": cells / dt,
            "shape": {"T": T, "B": B, "L": L, "n_shards": n}}


def bench_train_step(backend: str) -> dict | None:
    """Full jitted feature-mode train step (LSTM head + NoBlankCTC + backward
    + Adam + metrics as one XLA program) — the single-chip number behind
    SCALING_r2.json."""
    import jax
    import jax.numpy as jnp

    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.train import trainer as tr

    B, T, F, C = 256, 10, 1024, 33
    (batch,) = synthetic_feature_batches(
        num_batches=1, batch_size=B, temporal=T, feat_dim=F, num_classes=C,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = LSTMHead(hidden=C)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.transpose(batch["feats"], (1, 0, 2)), train=True,
    )
    state = tr.TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tr.torch_style_adam(1e-3),
    )
    step = tr.make_train_step(model)
    rng = jax.random.PRNGKey(2)
    try:
        state, metrics = step(state, batch, rng)
        jax.block_until_ready(metrics["loss"])
        # This step is ~0.2-0.7 ms of device work behind a remote-pool
        # dispatch chain whose scheduling latency varies several-fold
        # between moments (measured 0.14-2.5 ms for identical code), so one
        # 50-iter loop is a lottery ticket: run 6 loops, report the median
        # loop average and the observed spread.
        iters, reps = 50, 6
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, batch, rng)
            jax.block_until_ready(metrics["loss"])
            times.append((time.perf_counter() - t0) / iters)
        dt = float(np.median(times))
    except Exception as e:  # pragma: no cover
        _log(f"train-step bench failed ({e}); skipping")
        return None
    _log(f"train step [{backend}]: {dt*1e3:.3f} ms/step (median of {reps} "
         f"loops; spread {min(times)*1e3:.3f}-{max(times)*1e3:.3f}) at "
         f"B={B} -> {B/dt:.3e} clips/s")
    return {"ms_per_step": dt * 1e3, "clips_per_s": B / dt,
            "ms_spread": [min(times) * 1e3, max(times) * 1e3],
            "shape": {"B": B, "T": T, "F": F, "C": C}}


def main():
    import jax

    backend = jax.default_backend()
    noblank = bench_noblank(backend)
    binary = bench_binary_e2e(backend)
    blank = bench_blank(backend)
    seq_kernel = bench_seq_kernel(backend)
    train = bench_train_step(backend)
    try:
        ref = bench_reference_eager()
    except Exception as e:  # pragma: no cover
        _log(f"reference bench failed ({e}); using conservative 1e5 cells/s")
        ref = 1e5

    headline = noblank.get("pallas") or noblank["xla"]
    details = {
        "backend": backend,
        "noblank_lattice": noblank,
        "binary_e2e": binary,
        "blank_ctc": blank,
        "seq_kernel_chain": seq_kernel,
        "train_step": train,
        "reference_eager_cells_per_s": ref,
        "methodology": ("async dispatch loops; per protocol the median of "
                        "5x50-iter loops; max(same-buffer, "
                        "8-distinct-buffers); train step = median of 6 "
                        "50-iter loops; seq_kernel_chain = median of "
                        "4x20-iter loops, 4 distinct buffers (335 MB "
                        "operands)"),
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)
    if "pallas" in noblank and "xla" in noblank:
        _log(f"pallas vs XLA-on-{backend} same shape: "
             f"{noblank['xla']['ms_per_step'] / noblank['pallas']['ms_per_step']:.2f}x")
    print(
        json.dumps(
            {
                "metric": "lattice_cells_per_s",
                "value": headline["cells_per_s"],
                "unit": "cells/s",
                "vs_baseline": headline["cells_per_s"] / ref,
            }
        )
    )


if __name__ == "__main__":
    main()
