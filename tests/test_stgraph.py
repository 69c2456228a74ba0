"""ST-graph: mean-field criterion parity vs the GENUINE reference
AsyncTFCriterion (random head tensors, no weight transplant needed), plus
base-model and helper checks."""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ctc_tpu.models.stgraph import (
    MessageStore,
    STGraphBase,
    STGraphCriterion,
    gtmat,
    winsmooth,
)

T, B = 5, 3
S, O, V = 6, 7, 8


def _heads(rng):
    heads = {
        "s": rng.standard_normal((T, B, S)).astype(np.float32),
        "o": rng.standard_normal((T, B, O)).astype(np.float32),
        "v": rng.standard_normal((T, B, V)).astype(np.float32),
    }
    shapes = {
        "so": (S, O), "ov": (O, V), "vs": (V, S),
        "ss": (S, S), "oo": (O, O), "vv": (V, V),
        "so_t": (S, O), "ov_t": (O, V), "vs_t": (V, S),
        "os_t": (O, S), "vo_t": (V, O), "sv_t": (S, V),
    }
    for k, (a, b) in shapes.items():
        heads[k] = rng.standard_normal((T, B, a, b)).astype(np.float32) * 0.3
    return heads


@pytest.mark.usefixtures("torch_cpu_patch")
def test_criterion_parity_vs_reference(rng):
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.layers.AsyncTFCriterion import AsyncTFCriterion

    heads = _heads(rng)
    s_target = rng.integers(1, S, size=B).astype(np.int64)
    L = 3
    o_target = rng.integers(1, O, size=(B, L)).astype(np.int64)
    v_target = rng.integers(1, V, size=(B, L)).astype(np.int64)
    lengths = np.array([3, 2, 1], dtype=np.int64)

    args = types.SimpleNamespace(
        temporal=T, batch_size=B, s_class=S, o_class=O, v_class=V
    )
    ref = AsyncTFCriterion(args)
    id_time = {"id": [f"v{i}" for i in range(B)],
               "time": torch.tensor(lengths)}
    t = lambda x: torch.tensor(x)
    s_out_r, o_out_r, v_out_r, loss_r = ref(
        t(heads["s"]), t(heads["o"]), t(heads["v"]),
        t(heads["so"]), t(heads["ov"]), t(heads["vs"]),
        t(heads["ss"]), t(heads["oo"]), t(heads["vv"]),
        t(heads["so_t"]), t(heads["ov_t"]), t(heads["vs_t"]),
        t(heads["os_t"]), t(heads["vo_t"]), t(heads["sv_t"]),
        t(s_target), t(o_target), t(v_target), id_time,
    )

    crit = STGraphCriterion(msg_n=T)
    jheads = {k: jnp.asarray(x) for k, x in heads.items()}
    s_out, o_out, v_out, loss = crit(
        jheads, jnp.asarray(s_target), jnp.asarray(o_target),
        jnp.asarray(v_target), jnp.asarray(lengths),
    )
    np.testing.assert_allclose(
        np.asarray(s_out), s_out_r.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o_out), o_out_r.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(v_out), v_out_r.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(loss), float(loss_r.detach()), rtol=1e-4, atol=1e-4
    )


@pytest.mark.usefixtures("torch_cpu_patch")
def test_winsmooth_parity(rng):
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.layers.AsyncTFCriterion import winsmooth as ref_winsmooth

    x = rng.standard_normal((9, 4, 5)).astype(np.float32)
    for k in (1, 2):
        want = ref_winsmooth(torch.tensor(x), kernelsize=k).numpy()
        got = np.asarray(winsmooth(jnp.asarray(x), k))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_stgraph_base_shapes(rng):
    model = STGraphBase(s_classes=S, o_classes=O, v_classes=V, num_low_rank=4)
    feat = jnp.asarray(rng.standard_normal((T, B, 64)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feat,
    )
    out = model.apply(variables, feat)
    assert out["s"].shape == (T, B, S)
    assert out["so"].shape == (T, B, S, O)
    assert out["os_t"].shape == (T, B, O, S)
    # end-to-end: base heads feed the criterion and produce a finite loss
    crit = STGraphCriterion(msg_n=T)
    _, _, _, loss = crit(
        out,
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B, 2), jnp.int32),
        jnp.ones((B, 2), jnp.int32),
        jnp.full((B,), 2),
    )
    assert np.isfinite(float(loss))


def test_message_store():
    store = MessageStore(maxsize=2, decay=1.0, sigma=10.0)
    store.set(["a", "a"], [1.0, 2.0], [np.ones(3), 2 * np.ones(3)])
    past = store.get(["a"], [3.0], 3, "past")
    assert past.shape == (1, 3)
    assert past[0, 0] > 0
    future = store.get(["a"], [3.0], 3, "future")
    np.testing.assert_array_equal(future, np.zeros((1, 3)))
    # queue bounded at maxsize
    store.set(["a"], [4.0], [3 * np.ones(3)])
    assert len(store._store["a"]) == 2


def test_gtmat():
    out = np.asarray(gtmat((3, 4), jnp.asarray([0, 2, 3])))
    assert out.shape == (3, 4)
    np.testing.assert_array_equal(out[1], [0, 0, 1, 0])
