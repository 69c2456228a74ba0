"""Crash recovery (auto-resume) and groundtruth-pickle IO."""

import numpy as np
import pytest

from ctc_tpu.data import synthetic_feature_batches
from ctc_tpu.models import LSTMHead
from ctc_tpu.train import Trainer
from ctc_tpu.utils.groundtruth import load_groundtruth, save_groundtruth


class _FlakyLoader:
    """Iterable that raises once at (epoch == fail_epoch)."""

    def __init__(self, batches, fail_epoch):
        self.batches = batches
        self.fail_epoch = fail_epoch
        self.iterations = 0

    def __iter__(self):
        epoch = self.iterations
        self.iterations += 1
        if epoch == self.fail_epoch:
            raise RuntimeError("injected data failure")
        return iter(self.batches)


def test_fit_auto_resumes_after_crash(tmp_path):
    batches = synthetic_feature_batches(
        num_batches=3, batch_size=8, temporal=6, feat_dim=32, num_classes=9,
    )
    val = synthetic_feature_batches(
        num_batches=1, batch_size=8, temporal=6, feat_dim=32, num_classes=9,
        seed=1,
    )
    trainer = Trainer(
        LSTMHead(hidden=9), lr=1e-3, steps_per_epoch=3,
        cache_dir=str(tmp_path), print_freq=1000, implementation="xla",
    )
    flaky = _FlakyLoader(batches, fail_epoch=2)
    state, history = trainer.fit(flaky, val, epochs=4, max_restarts=1)
    # 4 completed epochs despite the injected crash
    assert len(history) == 4
    assert all(np.isfinite(h["train"]["loss"]) for h in history)

    # without restarts the crash propagates
    trainer2 = Trainer(
        LSTMHead(hidden=9), lr=1e-3, steps_per_epoch=3,
        cache_dir=str(tmp_path / "b"), print_freq=1000, implementation="xla",
    )
    with pytest.raises(RuntimeError, match="injected"):
        trainer2.fit(_FlakyLoader(batches, 1), val, epochs=3, max_restarts=0)


def test_groundtruth_pickle_roundtrip(tmp_path):
    table = {"vidA": [[1, 2, 3], [0, 5, 7]], "vidB": [[2, 2, 2]]}
    p = str(tmp_path / "gt.p")
    save_groundtruth(p, table)
    assert load_groundtruth(p) == table


def test_reads_reference_groundtruth_pickle():
    """The reference's shipped artifact loads in our format."""
    table = load_groundtruth("/root/reference/utils/groundtruth.p")
    assert len(table) > 0
    vid, rows = next(iter(table.items()))
    assert isinstance(vid, str)
    assert all(len(r) == 3 for r in rows[:5])


def test_checkpoint_roundtrip_under_mesh(tmp_path):
    """Orbax save/load round-trips a Trainer(mesh=...) state whose params
    are replicated over an 8-device mesh (the multihost checkpoint path,
    single-process form) — and a composed data×model state too."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.parallel.mesh import make_mesh
    from ctc_tpu.train import Trainer
    from ctc_tpu.train import checkpoints as ckpt

    batches = synthetic_feature_batches(
        num_batches=1, batch_size=8, temporal=6, feat_dim=16,
        num_classes=12, seed=3, binary=True,
    )
    for name, kwargs, mesh in (
        ("dp", {}, make_mesh(data=8)),
        ("dm", {"model_parallel": 4}, make_mesh(data=2, model=4)),
    ):
        tr = Trainer(LSTMHead(hidden=12, dropout_rate=0.0),
                     loss_kind="binary", implementation="xla",
                     mesh=mesh, **kwargs)
        state = tr.init_state(batches[0])
        state, _ = tr.train_step(
            state, tr._place(batches[0]), jax.random.PRNGKey(0)
        )
        d = str(tmp_path / name)
        ckpt.save(d, state, epoch=0, score=0.5)
        fresh = tr.init_state(batches[0])
        restored, epoch, score = ckpt.load(d, fresh)
        assert epoch == 0 and abs(score - 0.5) < 1e-9
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the restored state still steps under the same mesh
        restored, m = tr.train_step(
            restored, tr._place(batches[0]), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(m["loss"]))


def test_retrain_into_existing_cache_dir(tmp_path):
    """A fresh run (no --resume) into a cache dir holding an older run's
    checkpoints must not crash or skip saves (orbax needs force=True when
    the new run's epoch is older than the manager's latest step)."""
    import jax

    from ctc_tpu.data import synthetic_feature_batches
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.train import Trainer
    from ctc_tpu.train import checkpoints as ckpt

    batches = synthetic_feature_batches(
        num_batches=2, batch_size=4, temporal=4, feat_dim=8, num_classes=6,
        seed=0,
    )
    tr = Trainer(LSTMHead(hidden=6, dropout_rate=0.0), loss_kind="noblank",
                 implementation="xla", cache_dir=str(tmp_path))
    state = tr.init_state(batches[0])
    tr.fit(batches, batches, epochs=3, state=state)  # saves epochs 0-2
    # second fresh run, same dir: epoch 0 save must land (and win 'best')
    state2 = tr.init_state(batches[0])
    tr.fit(batches, batches, epochs=1, state=state2)
    restored, epoch, _ = ckpt.load(str(tmp_path), tr.init_state(batches[0]))
    assert epoch == 2  # latest step on disk is still the first run's last
    # but epoch 0 was re-written by the second run (no silent skip)
    _, e0, _ = ckpt.load(str(tmp_path), tr.init_state(batches[0]), epoch=0)
    assert e0 == 0
