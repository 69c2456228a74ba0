"""Training-health guards: non-finite updates skipped, grad norms logged."""

import numpy as np

import jax.numpy as jnp
import optax

from ctc_tpu.train.guards import log_grad_norms, skip_nonfinite_updates


def test_skip_nonfinite_updates():
    tx = skip_nonfinite_updates(optax.sgd(0.1))
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)

    good = {"w": jnp.ones((3,))}
    updates, state = tx.update(good, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1 * np.ones(3))
    assert int(state.skipped) == 0

    bad = {"w": jnp.array([1.0, jnp.nan, 1.0])}
    updates, state = tx.update(bad, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), np.zeros(3))
    assert int(state.skipped) == 1

    updates, state = tx.update(good, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1 * np.ones(3))
    assert int(state.skipped) == 1


def test_log_grad_norms_identity():
    tx = optax.chain(log_grad_norms(every=2), optax.sgd(1.0))
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.full((2,), 3.0)}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -3.0 * np.ones(2))


def test_profile_dir_collects_trace(tmp_path):
    """--profile-dir: the first trained epoch emits a jax.profiler trace
    (SURVEY.md §5.1 — the reference has only wall-clock meters)."""
    import os

    from ctc_tpu.cli.main import main

    trace_dir = tmp_path / "trace"
    main([
        "--dataset", "synthetic", "--epochs", "2", "--batch-size", "4",
        "--temporal", "6", "--extract-feat-dim", "8", "--v-class", "7",
        "--cache-dir", str(tmp_path), "--name", "prof",
        "--print-train-freq", "100", "--print-test-freq", "100",
        "--profile-dir", str(trace_dir),
    ])
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(trace_dir) for f in fs
    ]
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz")
               for f in found), found
