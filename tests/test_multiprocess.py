"""REAL multi-process data-parallel training: two OS processes joined via
jax.distributed (gloo), each feeding its local batch shard
(make_array_from_process_local_data), gradients all-reduced across processes
— the BASELINE config-5 mechanism, verified against single-process training.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    import numpy as np
    proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    if num_procs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=num_procs, process_id=proc_id,
        )
    import jax.numpy as jnp
    sys.path.insert(0, "@REPO@")
    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.parallel import make_mesh, make_sharded_train_step, replicate
    from ctc_tpu.train.trainer import TrainState, torch_style_adam
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=len(jax.devices()))
    B = 8
    batches = synthetic_feature_batches(num_batches=3, batch_size=B,
        temporal=6, feat_dim=32, num_classes=9, seed=0)
    model = LSTMHead(hidden=9, dropout_rate=0.0)
    feats = jnp.transpose(jnp.asarray(batches[0]["feats"]), (1, 0, 2))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, feats,
                           train=True)
    state = TrainState.create(
        params=replicate(variables["params"], mesh),
        batch_stats=replicate(variables["batch_stats"], mesh),
        tx=torch_style_adam(1e-2),
    )
    step = make_sharded_train_step(model, mesh, "noblank",
                                   implementation="xla")
    sharding = NamedSharding(mesh, P("data"))

    def place(batch):
        lo = proc_id * (B // num_procs)
        hi = (proc_id + 1) * (B // num_procs)
        return {
            k: jax.make_array_from_process_local_data(
                sharding, np.asarray(v)[lo:hi]
            )
            for k, v in batch.items()
        }

    rng = jax.random.PRNGKey(0)
    for epoch in range(3):
        for b in batches:
            state, metrics = step(state, place(b), rng)
    print("FINAL_LOSS", float(metrics["loss"]), flush=True)
    """
)


def _run_workers(num_procs: int, port: int):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _WORKER.replace("@REPO@", repo)
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={2 // num_procs}",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", "-c", script, str(i), str(num_procs),
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(num_procs)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    losses = []
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, f"worker {i} failed:\n{out}"
        line = [l for l in out.splitlines() if l.startswith("FINAL_LOSS")]
        assert line, out
        losses.append(float(line[-1].split()[1]))
    return losses


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    multi = _run_workers(2, port=12411)
    assert abs(multi[0] - multi[1]) < 1e-9  # both ranks agree
    single = _run_workers(1, port=12412)
    np.testing.assert_allclose(multi[0], single[0], rtol=1e-4, atol=1e-5)
