"""Run the shard_map train step on the REAL chip as a 1-device mesh with
``implementation='pallas'`` (VERDICT r2 #5: every prior multi-device
artifact ran XLA; the sharded step had never executed the Pallas kernels
on hardware).

For each lattice loss: one sharded+Pallas step vs one unsharded+Pallas step
from the same state — losses must match exactly, params to float tolerance.
Writes the record to VALIDATE_SHARDED_r4.json (its own artifact — the r3
name collided with the driver dryrun output).  TPU-claiming python: run alone.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.data import synthetic_feature_batches
from ctc_tpu.models import LSTMHead
from ctc_tpu.parallel import make_mesh, make_sharded_train_step, replicate, shard_batch
from ctc_tpu.train.trainer import TrainState, make_train_step, torch_style_adam


def main():
    print("devices:", jax.devices(), flush=True)
    x = jnp.ones((128, 128))
    (x @ x).block_until_ready()
    print("probe ok", flush=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    mesh = make_mesh(data=1)
    results = {"backend": "tpu", "mesh": "1-device data mesh",
               "implementation": "pallas", "losses": {}}
    for loss_kind in ("noblank", "binary", "blank"):
        batches = synthetic_feature_batches(
            num_batches=1, batch_size=64, temporal=16, feat_dim=128,
            num_classes=33, max_path=8, seed=1,
            binary=(loss_kind == "binary"),
        )
        model = LSTMHead(hidden=33, dropout_rate=0.0)
        feats = jnp.transpose(jnp.asarray(batches[0]["feats"]), (1, 0, 2))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            feats, train=True,
        )
        state = TrainState.create(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=torch_style_adam(1e-3),
        )
        rng = jax.random.PRNGKey(7)
        batch = {k: jnp.asarray(v) for k, v in batches[0].items()}

        single = make_train_step(model, loss_kind, implementation="pallas")
        t0 = time.time()
        s_u, m_u = single(state, batch, rng)
        jax.block_until_ready(m_u["loss"])
        t_single = time.time() - t0

        sharded = make_sharded_train_step(
            model, mesh, loss_kind, implementation="pallas"
        )
        state_r = state.replace(
            params=replicate(state.params, mesh),
            batch_stats=replicate(state.batch_stats, mesh),
        )
        t0 = time.time()
        s_s, m_s = sharded(state_r, shard_batch(batches[0], mesh), rng)
        jax.block_until_ready(m_s["loss"])
        t_sharded = time.time() - t0

        lu, ls = float(m_u["loss"]), float(m_s["loss"])
        max_dp = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(s_u.params),
                            jax.tree_util.tree_leaves(s_s.params))
        )
        ok = abs(lu - ls) <= 1e-5 + 1e-5 * abs(lu) and max_dp < 1e-4
        print(f"{loss_kind}: unsharded+pallas loss {lu:.6f} "
              f"({t_single:.1f}s incl compile) | sharded+pallas loss "
              f"{ls:.6f} ({t_sharded:.1f}s) | max param delta {max_dp:.2e} "
              f"-> {'OK' if ok else 'MISMATCH'}", flush=True)
        results["losses"][loss_kind] = {
            "unsharded_loss": lu, "sharded_loss": ls,
            "max_param_delta": max_dp, "ok": ok,
        }
        assert ok, f"{loss_kind} sharded/pallas mismatch"

    with open("VALIDATE_SHARDED_r4.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote VALIDATE_SHARDED_r4.json", flush=True)


if __name__ == "__main__":
    main()
