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
