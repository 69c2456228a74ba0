"""Golden tests: our Charades windowing/target construction must match the
GENUINE reference prepare() (charades_ctc_next_pred.py) sample by sample on a
synthetic mini-dataset covering the skip/dedup/balancing rules."""

import os
import sys
import types

import numpy as np
import pytest

from ctc_tpu.data import charades as ours
from ctc_tpu.data.charades_classes import SCENE_TO_INT

TEMPORAL, GAP, NUM_TRANS = 4, 1, 1


def _make_synthetic_dataset(tmp_path, rng, n_videos=14):
    """CSV + fake frame dirs exercising every code path."""
    scenes = list(SCENE_TO_INT.keys())
    rows = []
    frame_counts = {}
    for i in range(n_videos):
        vid = f"SYN{i:02d}"
        n_frames = int(rng.integers(100, 1500))
        # a couple of degenerate videos
        if i == 0:
            n_frames = 50  # too short
        if i == 1:
            pass  # will get a single label -> skipped
        frame_counts[vid] = n_frames
        n_time = n_frames / 24.0
        n_labels = 1 if i == 1 else int(rng.integers(2, 8))
        actions = []
        for _ in range(n_labels):
            c = int(rng.integers(0, 157))
            start = round(float(rng.uniform(0, max(n_time * 1.1, 1.0))), 2)
            end = round(start + float(rng.uniform(0.5, 15.0)), 2)
            actions.append(f"c{c:03d} {start:.2f} {end:.2f}")
        rows.append((vid, scenes[int(rng.integers(0, len(scenes)))],
                     ";".join(actions)))

    csv_path = tmp_path / "synthetic.csv"
    with open(csv_path, "w") as f:
        f.write("id,subject,scene,quality,relevance,verified,script,"
                "objects,descriptions,actions,length\n")
        for vid, scene, actions in rows:
            f.write(f'{vid},S1,"{scene}",5,5,1,s,o,d,"{actions}",10\n')

    rgb_root = tmp_path / "rgb"
    for vid, n in frame_counts.items():
        d = rgb_root / vid
        d.mkdir(parents=True)
        for j in range(n):
            (d / f"{vid}-{j+1:06d}.jpg").touch()
    return str(csv_path), str(rgb_root), frame_counts


@pytest.fixture(scope="module")
def reference_dataset_module():
    """Import the genuine reference dataset module with torchvision stubbed."""
    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")

    class _Dummy:  # transforms are only touched in get(), not in prepare()
        def __init__(self, *a, **k):
            pass

    for name in ("Normalize", "Compose", "Resize", "CenterCrop", "ToTensor",
                 "RandomCrop", "RandomResizedCrop", "Scale"):
        setattr(tv_t, name, _Dummy)
    tv.transforms = tv_t
    tv.get_image_backend = lambda: "PIL"
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_t)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib

    mod = importlib.import_module("datasets.charades_ctc_next_pred")

    class _TolerantNames(dict):
        """The reference's debug-CSV writer indexes its name tables with 0-d
        ndarrays (unhashable) and padded -1 entries — crashes under modern
        torch/numpy.  Data construction is unaffected; neutralize it."""

        def __getitem__(self, key):
            try:
                key = int(key)
            except Exception:
                return "pad"
            return super().__getitem__(key) if key in self else "pad"

    class PatchedCharades(mod.Charades):
        def prepare(self, *a, **k):
            self.o_name = _TolerantNames(self.o_name)
            self.v_name = _TolerantNames(self.v_name)
            self.s_name = _TolerantNames(self.s_name)
            return mod.Charades.prepare(self, *a, **k)

    mod.PatchedCharades = PatchedCharades
    return mod


@pytest.mark.parametrize("split", ["train", "val_video"])
def test_windowing_matches_reference(tmp_path, reference_dataset_module, split):
    rng = np.random.default_rng(7)
    csv_path, rgb_root, frame_counts = _make_synthetic_dataset(tmp_path, rng)

    ref_mod = reference_dataset_module
    cwd = os.getcwd()
    os.chdir(tmp_path)  # reference writes ./cr_caches/*.csv relative to cwd
    os.makedirs("cr_caches", exist_ok=True)
    try:
        ref = ref_mod.PatchedCharades(
            rgb_root, split, csv_path, str(tmp_path) + "/", TEMPORAL, GAP,
            NUM_TRANS,
        )
    finally:
        os.chdir(cwd)

    labels = ours.parse_charades_csv(csv_path)
    data, gt_table = ours.prepare_windows(
        labels, frame_counts, split, TEMPORAL, GAP, NUM_TRANS,
        rgb_root=rgb_root,
    )

    assert len(data["ids"]) == len(ref.data["ids"]) > 0
    assert data["ids"] == list(ref.data["ids"])
    assert data["rgb_image_paths"] == [
        list(p) for p in ref.data["rgb_image_paths"]
    ]
    for k in ("o_times", "v_times", "s_times", "s_targets", "s_f_targets"):
        assert [int(x) if not hasattr(x, "numpy") else int(np.asarray(x).reshape(-1)[0])
                for x in ref.data[k]] == [int(np.asarray(x).reshape(-1)[0])
                                          if hasattr(x, "shape") else int(x)
                                          for x in data[k]], k
    for i in range(len(data["ids"])):
        np.testing.assert_array_equal(
            np.asarray(data["o_targets"][i]),
            np.asarray(ref.data["o_targets"][i]),
            err_msg=f"o_targets[{i}]",
        )
        np.testing.assert_array_equal(
            np.asarray(data["v_targets"][i]),
            np.asarray(ref.data["v_targets"][i]),
            err_msg=f"v_targets[{i}]",
        )
        np.testing.assert_array_equal(
            np.asarray(data["o_f_targets"][i]),
            np.asarray(ref.data["o_f_targets"][i]),
            err_msg=f"o_f_targets[{i}]",
        )
        rv = ref.data["v_f_targets"][i]
        np.testing.assert_array_equal(
            np.asarray(data["v_f_targets"][i]), np.asarray(rv),
            err_msg=f"v_f_targets[{i}]",
        )
    if split == "val_video":
        assert set(gt_table.keys()) == set(ref.gt_table.keys())
        for vid in gt_table:
            assert gt_table[vid] == ref.gt_table[vid], vid
