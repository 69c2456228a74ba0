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
