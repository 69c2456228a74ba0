"""Product-level data-parallel training + guard/recovery flags through the
CLI driver (``ctc_tpu.cli.main``), on the 8-virtual-device CPU mesh.

This is the library->product wiring the reference *intended* with its DDP
wrap + DistributedSampler (/root/reference/models/__init__.py:33-43,
datasets/__init__.py:17-20, both broken there): ``--data-parallel N`` must
train with gradients provably synced — the CLI run on an N-device mesh
reproduces the single-device run's losses exactly (dropout 0).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_tpu.cli.main import main
from ctc_tpu.data import synthetic_feature_batches
from ctc_tpu.models import LSTMHead
from ctc_tpu.train import Trainer


def _argv(tmp_path, name, extra=()):
    return [
        "--dataset", "synthetic", "--epochs", "2", "--batch-size", "8",
        "--temporal", "6", "--extract-feat-dim", "32", "--v-class", "11",
        "--dropout", "0.0", "--lr", "0.001",
        "--cache-dir", str(tmp_path), "--name", name,
        "--print-train-freq", "100", "--print-test-freq", "100",
        *extra,
    ]


def test_cli_data_parallel_matches_single_device(tmp_path):
    """`python -m ctc_tpu.cli.main --data-parallel 4` == single-device run.

    --skip-nonfinite rides along on both runs: with finite gradients the
    guard is an exact identity, so the histories must still match — this
    covers the CLI plumbing of the guard in both code paths.
    """
    single = main(_argv(tmp_path, "single", ["--skip-nonfinite"]))
    sharded = main(
        _argv(tmp_path, "dp4", ["--data-parallel", "4", "--skip-nonfinite"])
    )
    assert len(single) == len(sharded) == 2
    for h_s, h_d in zip(single, sharded):
        np.testing.assert_allclose(
            h_s["train"]["loss"], h_d["train"]["loss"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            h_s["val"]["loss"], h_d["val"]["loss"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            h_s["val"]["top1"], h_d["val"]["top1"], rtol=1e-4, atol=1e-5
        )


def test_cli_rejects_nondivisible_batch(tmp_path):
    with pytest.raises(SystemExit, match="divisible"):
        main(_argv(tmp_path, "bad", ["--data-parallel", "3"]))


def test_cli_max_restarts_recovers(tmp_path, monkeypatch):
    """--max-restarts: a mid-training crash restores the last checkpoint and
    the run completes (the reference's only recovery story is a pdb
    post-mortem, ctc_exe.py:28-36)."""
    orig = Trainer.train_epoch
    calls = {"n": 0}

    def flaky(self, state, loader, epoch):
        calls["n"] += 1
        if calls["n"] == 2:  # crash in epoch 1, after epoch 0 checkpointed
            raise RuntimeError("injected fault")
        return orig(self, state, loader, epoch)

    monkeypatch.setattr(Trainer, "train_epoch", flaky)
    history = main(_argv(tmp_path, "restarts", ["--max-restarts", "1"]))
    assert len(history) == 2  # both epochs recorded despite the crash
    assert calls["n"] == 3  # epoch 0, failed epoch 1, retried epoch 1


def test_cli_grad_norm_freq_logs(tmp_path, capfd):
    main(_argv(tmp_path, "gnorm", ["--grad-norm-freq", "4"]))
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "global grad norm" in out


def test_trainer_skip_nonfinite_drops_poisoned_step():
    """A NaN batch must leave params untouched and bump the skip counter;
    a clean batch must still update (guards.skip_nonfinite_updates wired
    into the Trainer, SURVEY.md §5.2)."""
    batches = synthetic_feature_batches(
        num_batches=1, batch_size=4, temporal=4, feat_dim=16, num_classes=8,
        seed=0,
    )
    model = LSTMHead(hidden=8, dropout_rate=0.0)
    tr = Trainer(model, loss_kind="noblank", implementation="xla",
                 skip_nonfinite=True)
    state = tr.init_state(batches[0])
    params0 = jax.tree_util.tree_map(np.asarray, state.params)

    bad = {k: jnp.asarray(v) for k, v in batches[0].items()}
    bad["feats"] = bad["feats"] * jnp.nan
    state_bad, metrics = tr.train_step(state, bad, jax.random.PRNGKey(0))
    for a, b in zip(
        jax.tree_util.tree_leaves(params0),
        jax.tree_util.tree_leaves(state_bad.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state_bad.opt_state.skipped) == 1

    good = {k: jnp.asarray(v) for k, v in batches[0].items()}
    state_good, _ = tr.train_step(state, good, jax.random.PRNGKey(0))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(params0),
            jax.tree_util.tree_leaves(state_good.params),
        )
    )
    assert changed
    assert int(state_good.opt_state.skipped) == 0


def test_trainer_model_parallel_matches_plain():
    """Trainer(model_parallel=4): the 157-class binary-CTC emission einsum
    sharded over a 'model' axis trains identically to the plain trainer
    (the --model-parallel product path; C=30 not divisible by 4 exercises
    the pad-class masking)."""
    batches = synthetic_feature_batches(
        num_batches=1, batch_size=8, temporal=12, feat_dim=16,
        num_classes=30, max_path=6, seed=4, binary=True,
    )
    model = LSTMHead(hidden=30, dropout_rate=0.0)
    common = dict(loss_kind="binary", lr=1e-3, seed=0, implementation="xla")
    tr_mp = Trainer(model, model_parallel=4, **common)
    tr_plain = Trainer(model, **common)
    s_mp = tr_mp.init_state(batches[0])
    s_plain = tr_plain.init_state(batches[0])
    b = {k: jnp.asarray(v) for k, v in batches[0].items()}
    rng_key = jax.random.PRNGKey(0)
    for _ in range(3):
        s_mp, m_mp = tr_mp.train_step(s_mp, b, rng_key)
        s_plain, m_plain = tr_plain.train_step(s_plain, b, rng_key)
        np.testing.assert_allclose(
            float(m_mp["loss"]), float(m_plain["loss"]), rtol=1e-4, atol=1e-5
        )
    np.testing.assert_allclose(
        float(tr_mp.eval_step(s_mp, b)["loss"]),
        float(tr_plain.eval_step(s_plain, b)["loss"]),
        rtol=1e-4, atol=1e-5,
    )


def test_trainer_model_parallel_rejects_nonbinary():
    model = LSTMHead(hidden=8, dropout_rate=0.0)
    with pytest.raises(ValueError, match="binary"):
        Trainer(model, loss_kind="noblank", model_parallel=4)


def test_cli_bf16_compute_dtype(tmp_path):
    """--compute-dtype bf16 trains and tracks the f32 run loosely (MXU
    matmuls in bfloat16, params/recurrence f32)."""
    f32 = main(_argv(tmp_path, "f32run"))
    bf16 = main(_argv(tmp_path, "bf16run", ["--compute-dtype", "bf16"]))
    assert bf16[-1]["train"]["loss"] < bf16[0]["train"]["loss"] * 1.01
    np.testing.assert_allclose(
        bf16[0]["train"]["loss"], f32[0]["train"]["loss"], rtol=0.05
    )


def test_cli_i3d_chunk_flag_plumbed():
    """--i3d-chunk reaches I3DLSTM.feat_chunk (pixels model construction,
    cli/main.py) without building a dataset."""
    from ctc_tpu import config as config_lib
    from ctc_tpu.models.i3d_lstm import I3DLSTM

    cfg = config_lib.parse([
        "--dataset", "charades_pixels", "--i3d-chunk", "40",
        "--batch-size", "16", "--temporal", "10",  # 160 % 40 == 0: chunk
        "--cache-dir", "/tmp/i3dchunk", "--name", "t",  # validates at parse
    ])
    assert cfg.i3d_chunk == 40
    model = I3DLSTM(
        hidden=cfg.head_classes, dropout_rate=cfg.dropout,
        freeze_backbone=not cfg.finetune_i3d, feat_chunk=cfg.i3d_chunk,
    )
    assert model.feat_chunk == 40


def test_cli_i3d_act_dtype_plumbed():
    """--i3d-act-dtype bf16 reaches I3DLSTM.i3d_act_dtype."""
    import jax.numpy as jnp

    from ctc_tpu import config as config_lib
    from ctc_tpu.models.i3d_lstm import I3DLSTM

    cfg = config_lib.parse([
        "--dataset", "charades_pixels", "--i3d-act-dtype", "bf16",
        "--cache-dir", "/tmp/actdtype", "--name", "t",
    ])
    model = I3DLSTM(
        hidden=cfg.head_classes,
        i3d_act_dtype=(jnp.bfloat16 if cfg.i3d_act_dtype == "bf16"
                       else None),
    )
    assert model.i3d_act_dtype == jnp.bfloat16
