"""Long-T sequence-sharded lattice scaling line (SURVEY.md §5.7 / VERDICT r2
#3): the T=4096 no-blank lattice pipelined over a ``seq`` mesh.

Run on the 8-virtual-device CPU mesh (run_tests.sh env) — virtual devices
share one host's cores, so wall-clock measures contention, not ICI; the
meaningful recorded facts are (a) correctness at every mesh size, (b) the
n-fold drop in per-shard T memory (the reason to seq-shard at all), (c) the
analytic per-tick ICI boundary-exchange bytes, and (d) the pipeline bubble
fraction at the default microbatch count vs the m=4n knob.

Prints one JSON document (paste into SCALING_r{N}.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.ops import lattice_xla
from ctc_tpu.parallel.seq_lattice import (
    make_seq_sharded_lattice_nll,
    shard_time_axis,
)

T, B, L = 4096, 16, 24


def main():
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    em = jnp.asarray((rng.standard_normal((T, B, L)) - 1).astype(np.float32))
    in_len = jnp.asarray(rng.integers(T // 2, T + 1, size=B))
    tgt_len = jnp.asarray(rng.integers(1, L + 1, size=B))
    want, _ = lattice_xla.noblank_lattice_forward(em, in_len, tgt_len)
    want = np.asarray(want)

    out = {
        "shape": {"T": T, "B": B, "L": L},
        "note": ("virtual CPU devices share one host's cores: wall-clock "
                 "is contention, not ICI; correctness + memory + analytic "
                 "comms are the recorded evidence"),
        "boundary_exchange_bytes_per_tick": B * L * 4,
        "mesh": {},
    }
    devices = jax.devices()
    for n in (1, 2, 4, 8):
        if n > len(devices):
            break
        mesh = Mesh(np.asarray(devices[:n]), ("seq",))
        row = {}
        for m_label, m in (("m=n", None), ("m=4n", 4 * n)):
            if m is not None and B % m:
                continue
            fn = make_seq_sharded_lattice_nll(
                mesh, num_microbatches=m
            )
            em_s = shard_time_axis(em, mesh)
            got = fn(em_s, in_len, tgt_len)
            np.testing.assert_allclose(np.asarray(got), want,
                                       rtol=1e-5, atol=1e-5)
            jax.block_until_ready(got)
            t0 = time.perf_counter()
            for _ in range(3):
                got = fn(em_s, in_len, tgt_len)
            jax.block_until_ready(got)
            dt = (time.perf_counter() - t0) / 3
            m_count = m or n
            row[m_label] = {
                "wall_s": round(dt, 4),
                "microbatches": m_count,
                "pipeline_ticks": m_count + n - 1,
                "bubble_fraction": round((n - 1) / (m_count + n - 1), 4),
            }
        row["per_shard_T"] = T // n
        row["per_shard_em_MB"] = round(T // n * B * L * 4 / 2**20, 2)
        out["mesh"][str(n)] = row
        print(f"n={n}: ok "
              + ", ".join(f"{k} wall {v['wall_s']}s bubble "
                          f"{v['bubble_fraction']}"
                          for k, v in row.items() if isinstance(v, dict)),
              flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
