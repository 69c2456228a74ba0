"""End-to-end pixels path: synthetic JPEGs -> windowing -> I3D features ->
collate -> one CLI training epoch."""

import os

import numpy as np
import pytest
from PIL import Image

from ctc_tpu import config as config_lib
from ctc_tpu.data.frames import load_frame, load_window, window_frame_paths


def _write_video(tmp_path, vid, n_frames, size=(64, 48)):
    d = tmp_path / "rgb" / vid
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(hash(vid) % 2**32)
    base = rng.integers(0, 255, (size[1], size[0], 3), np.uint8)
    for j in range(n_frames):
        Image.fromarray(base).save(d / f"{vid}-{j+1:06d}.jpg")


def test_frame_loading(tmp_path):
    _write_video(tmp_path, "AAA", 40)
    p = str(tmp_path / "rgb" / "AAA" / "AAA-000003.jpg")
    frame = load_frame(p, inputsize=224)
    assert frame.shape == (224, 224, 3)
    assert -1.0 <= frame.min() and frame.max() <= 1.0

    paths = window_frame_paths(p, gap=2, stack=5)
    assert paths[0].endswith("000003.jpg")
    assert paths[1].endswith("000006.jpg")

    clip = load_window([p, p], gap=2, stack=5, inputsize=224)
    assert clip.shape == (2, 5, 224, 224, 3)


@pytest.mark.slow
def test_charades_pixels_cli_epoch(tmp_path):
    """Full CLI run on a synthetic Charades mini-dataset through random-init
    I3D feature extraction (the heaviest integration test)."""
    from ctc_tpu.cli.main import main

    rng = np.random.default_rng(3)
    vids = []
    csv_lines = [
        "id,subject,scene,quality,relevance,verified,script,objects,"
        "descriptions,actions,length"
    ]
    for i in range(2):
        vid = f"PIX{i}"
        n_frames = 300
        _write_video(tmp_path, vid, n_frames)
        acts = []
        t0 = 0.5
        for j in range(4):
            c = int(rng.integers(0, 157))
            start = t0 + float(rng.uniform(0.3, 2.0))
            acts.append(f"c{c:03d} {start:.2f} {start + 6:.2f}")
            t0 = start
        csv_lines.append(f'{vid},S1,"Bedroom",5,5,1,s,o,d,"{";".join(acts)}",10')
        vids.append(vid)
    csv_path = tmp_path / "train.csv"
    csv_path.write_text("\n".join(csv_lines) + "\n")

    history = main([
        "--dataset", "charades_ctc_next_pred",
        "--rgb-data", str(tmp_path / "rgb"),
        "--train-file", str(csv_path),
        "--val-file", str(csv_path),
        "--cache-dir", str(tmp_path / "cache") + "/",
        "--name", "pixels-e2e",
        "--temporal", "2",
        "--gap", "1",
        "--num-trans", "1",
        "--batch-size", "2",
        "--epochs", "1",
        "--inputsize", "224",
        "--lattice-impl", "xla",
    ])
    assert len(history) == 1
    assert np.isfinite(history[0]["train"]["loss"])
