"""Dataset-registry loader modules: every reference dataset name resolves
(reference datasets/__init__.py:14 dynamic dispatch), collates produce the
standard batch contract, and the final-step loss kinds (ce/bce/mlce) train.
"""

import importlib

import numpy as np
import pytest

from ctc_tpu.data.synthetic import synthetic_feature_batches


REGISTRY = [
    "synthetic",
    "charades",
    "charades_ctc_next_pred",
    "charades_ver2",
    "charades_ver3",
    "charades_ver2_c_class",
    "charades_my_pred",
    "myvideo",
    "myvideo_ver3",
    "myvideo_c_class",
]


def test_registry_modules_importable():
    for name in REGISTRY:
        mod = importlib.import_module(f"ctc_tpu.data.loaders.{name}")
        assert callable(getattr(mod, "get")), name


def test_collate_ver2():
    from ctc_tpu.data.loaders.charades_ver2 import collate_ver2

    adjust_time, n_cls = 4, 6
    o0 = np.zeros((adjust_time, n_cls), np.int32)
    o0[0, 2] = 1
    o0[1, 4] = 1
    o0[2:] = -1  # padding
    o1 = np.zeros((adjust_time, n_cls), np.int32)
    o1[0, 1] = 1
    o1[1, 3] = 1
    o1[2, 5] = 1
    o1[3:] = -1
    data = {"o_targets": [o0, o1], "times": [2, 3]}
    feats = np.ones((2, 7, 16), np.float32)
    batch = collate_ver2(data, [0, 1], feats)
    assert batch["paths"].shape == (2, adjust_time, n_cls)
    assert batch["paths"].min() == 0.0  # -1 padding zeroed
    np.testing.assert_array_equal(batch["target_lengths"], [2, 3])
    np.testing.assert_array_equal(batch["input_lengths"], [7, 7])
    # future target = argmax of the last in-length (future) path step
    np.testing.assert_array_equal(batch["future_target"], [4, 5])


@pytest.mark.parametrize("loss,expect_shape", [("ce", (2,)), ("bce", (2, 6))])
def test_collate_ver3(loss, expect_shape):
    from ctc_tpu.data.loaders.charades_ver3 import collate_ver3

    o = [np.eye(6, dtype=np.int32)[2], np.eye(6, dtype=np.int32)[5]]
    v = [np.eye(6, dtype=np.int32)[1], np.eye(6, dtype=np.int32)[3]]
    data = {"o_targets": o, "v_targets": v}
    feats = np.ones((2, 5, 16), np.float32)
    batch = collate_ver3(data, [0, 1], feats, loss)
    assert batch["paths"].shape == expect_shape
    if loss == "ce":
        np.testing.assert_array_equal(batch["paths"], [1, 3])  # verb index
        np.testing.assert_array_equal(batch["future_target"], [1, 3])
    else:
        np.testing.assert_array_equal(np.argmax(batch["paths"], 1), [2, 5])
        np.testing.assert_array_equal(batch["future_target"], [2, 5])


def test_collate_v1_pads_to_batch_max():
    from ctc_tpu.data.loaders.charades import collate_v1

    n_cls = 6
    o0 = np.zeros((2, n_cls), np.int32)
    o0[0, 1] = 1
    o0[1, 2] = 1
    o1 = np.zeros((4, n_cls), np.int32)
    o1[np.arange(4), [0, 3, 4, 5]] = 1
    data = {"o_targets": [o0, o1], "times": [3, 5]}
    feats = np.ones((2, 5, 16), np.float32)
    batch = collate_v1(data, [0, 1], feats)
    assert batch["paths"].shape == (2, 4, n_cls)
    np.testing.assert_array_equal(batch["target_lengths"], [2, 4])
    np.testing.assert_array_equal(batch["future_target"], [2, 5])


def test_empty_splits_return_empty_batches(tmp_path):
    """Header-only CSV -> no samples -> ([], []) without feature extraction."""
    from ctc_tpu import config as config_lib

    csv_path = tmp_path / "empty.csv"
    csv_path.write_text(
        "id,subject,scene,quality,relevance,verified,script,objects,"
        "descriptions,actions,length\n"
    )
    cfg = config_lib.parse([
        "--rgb-data", str(tmp_path / "rgb"),
        "--train-file", str(csv_path),
        "--val-file", str(csv_path),
        "--cache-dir", str(tmp_path / "cache") + "/",
        "--name", "loaders-empty",
    ])
    for name in ("charades", "charades_ver2", "charades_ver3",
                 "charades_ver2_c_class"):
        mod = importlib.import_module(f"ctc_tpu.data.loaders.{name}")
        train, val = mod.get(cfg)
        assert train == [] and val == [], name


def test_myvideo_loaders_empty_frames(tmp_path):
    """With no frames on disk the my-video eval loaders return empty data
    dicts and never touch the feature extractor."""
    from ctc_tpu import config as config_lib

    cfg = config_lib.parse([
        "--rgb-my-data", str(tmp_path / "none"),
        "--cache-dir", str(tmp_path / "cache") + "/",
        "--name", "loaders-myvideo",
    ])
    for name in ("myvideo", "myvideo_ver3", "myvideo_c_class",
                 "charades_my_pred"):
        mod = importlib.import_module(f"ctc_tpu.data.loaders.{name}")
        data, gt = mod.get(cfg)
        assert len(data["ids"]) == 0 and gt is None, name


def _final_step_loaders(loss):
    from ctc_tpu.data.loaders.synthetic import _final_step_batches

    binary = loss in ("bce", "mlce")
    train = synthetic_feature_batches(
        num_batches=6, batch_size=8, temporal=10, feat_dim=64,
        num_classes=12, binary=binary, seed=0,
    )
    val = synthetic_feature_batches(
        num_batches=2, batch_size=8, temporal=10, feat_dim=64,
        num_classes=12, binary=binary, seed=1,
    )
    return _final_step_batches(train, loss), _final_step_batches(val, loss)


@pytest.mark.parametrize("loss", ["ce", "bce", "mlce"])
def test_trainer_final_step_losses(loss, tmp_path):
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.train import Trainer

    train, val = _final_step_loaders(loss)
    trainer = Trainer(
        LSTMHead(hidden=12), loss_kind=loss, lr=5e-3,
        steps_per_epoch=len(train), cache_dir=str(tmp_path), print_freq=100,
    )
    state, history = trainer.fit(train, val, epochs=4)
    losses = [h["train"]["loss"] for h in history]
    assert np.all(np.isfinite(losses)), history
    if loss != "mlce":  # the reference's double-softmax quirk moves slowly
        assert losses[-1] < losses[0], history
    if loss == "ce":  # top-1 on 12 classes is noisy for the multi-hot losses
        assert history[-1]["train"]["top1"] > history[0]["train"]["top1"]


def test_cli_head_width_follows_loss(tmp_path):
    """--loss bce on the synthetic registry: head widens to o_class and a
    1-epoch run finishes with finite loss."""
    from ctc_tpu.cli.main import main

    history = main([
        "--dataset", "synthetic",
        "--loss", "bce",
        "--epochs", "1",
        "--batch-size", "4",
        "--temporal", "4",
        "--cache-dir", str(tmp_path / "cache") + "/",
        "--name", "cli-bce",
    ])
    assert len(history) == 1
    assert np.isfinite(history[0]["train"]["loss"])


def test_lazy_batches_collate_on_access_and_prefetch_iter():
    from ctc_tpu.data.loaders._common import LazyBatches

    calls = []

    def collate(data, idx, feats):
        calls.append(list(idx))
        return {"feats": np.zeros((len(list(idx)), 2, 3), np.float32)}

    class NoFeats:
        def __getitem__(self, idx):
            return None

    lazy = LazyBatches({"ids": list(range(6))}, NoFeats(),
                       [[0, 1], [2, 3], [4, 5]], collate)
    assert len(lazy) == 3
    assert calls == []            # nothing collated eagerly
    b = lazy[1]
    assert calls == [[2, 3]]      # only the accessed batch
    assert b["feats"].shape == (2, 2, 3)
    got = [batch["feats"].shape[0] for batch in lazy]  # prefetching iterator
    assert got == [2, 2, 2]
    assert len(calls) == 4
