"""Data loading glue: collate, host sharding, prefetch — and an end-to-end
charades-windowing -> collate -> Trainer drive on synthetic features."""

import numpy as np

from ctc_tpu.data import charades
from ctc_tpu.data.loading import (
    Prefetcher,
    collate_binary_ctc,
    collate_verb_ctc,
    host_shard_indices,
)


def _tiny_prepared(rng, temporal=4):
    labels = {}
    frame_counts = {}
    for i in range(8):
        vid = f"V{i}"
        frame_counts[vid] = 1200
        acts = []
        t0 = 0.0
        for j in range(5):
            c = int(rng.integers(0, 157))
            start = t0 + float(rng.uniform(0.5, 6))
            acts.append(
                {"scene": 3, "class": f"c{c:03d}", "start": round(start, 2),
                 "end": round(start + float(rng.uniform(2, 10)), 2)}
            )
            t0 = start
        labels[vid] = acts
    data, _ = charades.prepare_windows(
        labels, frame_counts, "train", temporal, 1, 1
    )
    assert len(data["ids"]) > 4
    return data


def test_collate_shapes(rng):
    data = _tiny_prepared(rng)
    n = len(data["ids"])
    feats = rng.standard_normal((4, 4, 32)).astype(np.float32)
    batch = collate_verb_ctc(data, range(4), feats)
    assert batch["paths"].shape == (4, 4)
    assert batch["feats"].shape == (4, 4, 32)
    assert np.all(batch["target_lengths"] >= 1)
    assert np.all(batch["target_lengths"] <= 4)

    bbatch = collate_binary_ctc(data, range(4), feats)
    assert bbatch["paths"].shape == (4, 4, 38)
    assert set(np.unique(bbatch["paths"])) <= {0.0, 1.0}


def test_host_shard_indices_partition():
    all_idx = []
    for p in range(4):
        for b in host_shard_indices(
            103, 4, process_index=p, process_count=4, seed=1
        ):
            assert len(b) == 4
            all_idx.extend(b.tolist())
    assert len(all_idx) == len(set(all_idx))  # disjoint across hosts
    # identical permutation across hosts: re-running host 0 gives same batches
    a = host_shard_indices(103, 4, process_index=0, process_count=4, seed=1)
    b = host_shard_indices(103, 4, process_index=0, process_count=4, seed=1)
    assert all((x == y).all() for x, y in zip(a, b))


def test_prefetcher_order_and_errors():
    src = list(range(20))
    out = list(Prefetcher(lambda: iter(src), depth=3))
    assert out == src

    def boom():
        yield 1
        raise RuntimeError("inner failure")

    try:
        list(Prefetcher(boom))
        assert False, "should raise"
    except RuntimeError as e:
        assert "inner failure" in str(e)


def test_windowed_charades_trains(rng):
    """prepare_windows output -> collate -> Trainer learns (synthetic feats)."""
    from ctc_tpu.models import LSTMHead
    from ctc_tpu.train import Trainer

    data = _tiny_prepared(rng, temporal=4)
    n = len(data["ids"])
    emb = np.random.default_rng(5).standard_normal((33, 48)).astype(np.float32)

    def feats_for(indices):
        f = np.zeros((len(indices), 4, 48), np.float32)
        for row, i in enumerate(indices):
            path = np.asarray(data["v_targets"][i])
            for t in range(4):
                lab = path[min(t, max(data["v_times"][i] - 1, 0))]
                f[row, t] = emb[max(int(lab), 0)] + 0.05 * rng.standard_normal(48)
        return f

    batches = [
        collate_verb_ctc(data, idx, feats_for(idx))
        for idx in host_shard_indices(n, 4, seed=0)
    ]
    trainer = Trainer(
        LSTMHead(hidden=33), lr=5e-3, steps_per_epoch=len(batches),
        implementation="xla",
    )
    state = trainer.init_state(batches[0])
    losses = []
    for epoch in range(5):
        state, metrics = trainer.train_epoch(state, batches, epoch)
        losses.append(metrics["loss"])
    assert losses[-1] < losses[0], losses


def test_device_prefetch_preserves_order_and_values():
    from ctc_tpu.data.loading import device_prefetch

    batches = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(batches, depth=2))
    assert [int(np.asarray(b["x"])[0]) for b in out] == list(range(5))
    assert list(device_prefetch([], depth=2)) == []
