"""LSTM head parity vs the genuine reference LSTM_cell (/root/reference/LSTM.py)
with transplanted weights, plus shape/backend sanity."""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ctc_tpu.models import LSTMHead

T, B, IN, H = 10, 6, 1024, 33


def _params_from_torch(ref):
    """Map reference torch weights into the flax param pytree."""
    lin = ref.v.layers[0]
    bn = ref.v.layers[1]
    cell = ref.v_cell
    params = {
        "feature_head": {
            "proj": {
                "kernel": jnp.asarray(lin.weight.detach().numpy().T),
                "bias": jnp.asarray(lin.bias.detach().numpy()),
            },
            "bn": {
                "scale": jnp.asarray(bn.weight.detach().numpy()),
                "bias": jnp.asarray(bn.bias.detach().numpy()),
            },
        },
        "input_gates": {
            "kernel": jnp.asarray(cell.weight_ih.detach().numpy().T),
            "bias": jnp.asarray(
                (cell.bias_ih + cell.bias_hh).detach().numpy()
            ),
        },
        "recurrent_kernel": jnp.asarray(cell.weight_hh.detach().numpy().T),
    }
    batch_stats = {
        "feature_head": {
            "bn": {
                "mean": jnp.asarray(bn.running_mean.detach().numpy()),
                "var": jnp.asarray(bn.running_var.detach().numpy()),
            }
        }
    }
    return params, batch_stats


@pytest.mark.usefixtures("torch_cpu_patch")
def test_lstm_head_matches_reference(rng):
    import LSTM as ref_lstm

    args = types.SimpleNamespace(
        extract_feat_dim=IN, v_class=H, batch_size=B, temporal=T
    )
    ref = ref_lstm.LSTM_cell(args)
    ref.v.layers[3].p = 0.0  # disable dropout for deterministic parity
    ref.train()

    feats = rng.standard_normal((T, B, IN)).astype(np.float32)
    h0 = np.zeros((B, H), np.float32)
    c0 = np.zeros((B, H), np.float32)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(feats), torch.tensor(h0), torch.tensor(c0)
        ).numpy()

    model = LSTMHead(hidden=H, dropout_rate=0.0)
    params, batch_stats = _params_from_torch(ref)
    out, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(feats),
        jnp.asarray(h0),
        jnp.asarray(c0),
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.usefixtures("torch_cpu_patch")
def test_lstm_head_eval_mode_matches_reference(rng):
    """Eval mode: BatchNorm uses running stats (shared across timesteps)."""
    import LSTM as ref_lstm

    args = types.SimpleNamespace(
        extract_feat_dim=IN, v_class=H, batch_size=B, temporal=T
    )
    ref = ref_lstm.LSTM_cell(args)
    # give the running stats non-trivial values
    ref.v.layers[1].running_mean.data = torch.randn(H) * 0.1
    ref.v.layers[1].running_var.data = torch.rand(H) + 0.5
    ref.eval()

    feats = rng.standard_normal((T, B, IN)).astype(np.float32)
    zeros = np.zeros((B, H), np.float32)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(feats), torch.tensor(zeros), torch.tensor(zeros)
        ).numpy()

    model = LSTMHead(hidden=H, dropout_rate=0.0)
    params, batch_stats = _params_from_torch(ref)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(feats),
        jnp.asarray(zeros),
        jnp.asarray(zeros),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-5)


def test_lstm_head_init_and_grad(rng):
    model = LSTMHead(hidden=H)
    feats = jnp.asarray(rng.standard_normal((T, B, IN)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats,
        train=True,
    )
    out = model.apply(variables, feats, train=False)
    assert out.shape == (T, B, H)

    def loss_fn(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats,
            train=False,
        )
        return jnp.mean(o**2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in flat)
