"""Golden tests: every dataset-variant builder vs its GENUINE reference module."""

import os

import numpy as np
import pytest

from ctc_tpu.data import charades as base
from ctc_tpu.data import charades_variants as ours
from ctc_tpu.data.charades_classes import SCENE_TO_INT

from ref_import import instantiate, load_reference_dataset

TEMPORAL, GAP, NUM_TRANS = 4, 1, 1


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic CSV + frame dirs shared by all variant tests."""
    tmp_path = tmp_path_factory.mktemp("variants")
    rng = np.random.default_rng(11)
    scenes = list(SCENE_TO_INT.keys())
    rows, frame_counts = [], {}
    for i in range(14):
        vid = f"VAR{i:02d}"
        n_frames = int(rng.integers(60, 1200))
        frame_counts[vid] = n_frames
        n_labels = 1 if i == 1 else int(rng.integers(2, 7))
        acts = []
        for _ in range(n_labels):
            c = int(rng.integers(0, 157))
            start = round(float(rng.uniform(0, 30)), 2)
            acts.append(
                f"c{c:03d} {start:.2f} {start + float(rng.uniform(0.5, 12)):.2f}"
            )
        rows.append((vid, scenes[int(rng.integers(0, len(scenes)))],
                     ";".join(acts)))
    csv_path = tmp_path / "variants.csv"
    with open(csv_path, "w") as f:
        f.write("id,subject,scene,quality,relevance,verified,script,objects,"
                "descriptions,actions,length\n")
        for vid, scene, actions in rows:
            f.write(f'{vid},S1,"{scene}",5,5,1,s,o,d,"{actions}",10\n')
    rgb_root = tmp_path / "rgb"
    for vid, n in frame_counts.items():
        d = rgb_root / vid
        d.mkdir(parents=True)
        for j in range(n):
            (d / f"{vid}-{j+1:06d}.jpg").touch()
    # the own-video twin needs a YUME0 dir
    d = rgb_root / "YUME0"
    d.mkdir()
    for j in range(600):
        (d / f"YUME0-{j+1:06d}.jpg").touch()
    labels = base.parse_charades_csv(str(csv_path))
    return {
        "tmp": tmp_path, "csv": str(csv_path), "rgb": str(rgb_root),
        "labels": labels, "frame_counts": frame_counts,
    }


def _run_reference(modname, ds, split="train", temporal=TEMPORAL, classname=None):
    mod = load_reference_dataset(modname)
    cls = getattr(mod, classname or ("Myvideo" if "my" in modname else "Charades"))
    cwd = os.getcwd()
    os.chdir(ds["tmp"])
    try:
        ref = instantiate(
            cls,
            rgb_root=ds["rgb"], split=split, labelpath=ds["csv"],
            cachedir=str(ds["tmp"]) + f"/cache_{modname}_{split}_",
            temporal=temporal, gap=GAP, num_trans=NUM_TRANS,
        )
    finally:
        os.chdir(cwd)
    return ref


def _cmp(ref_data, our_data, keys):
    assert list(ref_data["ids"]) == list(our_data["ids"])
    assert [list(p) for p in ref_data["rgb_image_paths"]] == list(
        our_data["rgb_image_paths"]
    )
    assert [int(x) for x in ref_data["times"]] == [
        int(x) for x in our_data["times"]
    ]
    for k in keys:
        for i, (a, b) in enumerate(zip(ref_data[k], our_data[k])):
            np.testing.assert_array_equal(
                np.asarray(a).reshape(-1), np.asarray(b).reshape(-1),
                err_msg=f"{k}[{i}]",
            )


def test_v1_parity(dataset):
    ref = _run_reference("charades", dataset)
    got = ours.prepare_v1(
        dataset["labels"], dataset["frame_counts"], TEMPORAL, GAP,
        rgb_root=dataset["rgb"],
    )
    _cmp(ref.data, got, ["s_targets", "o_targets", "v_targets"])


def test_ver2_parity(dataset):
    ref = _run_reference("charades_ver2", dataset)
    got = ours.prepare_ver2(
        dataset["labels"], dataset["frame_counts"], TEMPORAL, GAP, NUM_TRANS,
        rgb_root=dataset["rgb"],
    )
    _cmp(ref.data, got, ["s_targets", "o_targets", "v_targets"])


def test_ver2_groundtruth_parity(dataset):
    ref = _run_reference("charades_ver2", dataset, split="groundtruth")
    got = ours.prepare_ver2_groundtruth(
        dataset["labels"], TEMPORAL, GAP, NUM_TRANS
    )
    assert ref.gt_table == got

    ref_f = _run_reference("charades_ver2", dataset, split="future_groundtruth")
    got_f = ours.prepare_ver2_future_groundtruth(dataset["labels"], TEMPORAL, GAP)
    assert ref_f.gt_future_table == got_f


@pytest.mark.parametrize("split", ["train", "val"])
def test_ver3_parity(dataset, split):
    ref = _run_reference("charades_ver3", dataset, split=split)
    got = ours.prepare_ver3(
        dataset["labels"], dataset["frame_counts"], split, TEMPORAL, GAP,
        NUM_TRANS, rgb_root=dataset["rgb"],
    )
    _cmp(ref.data, got, ["s_targets", "o_targets", "v_targets"])


@pytest.mark.parametrize("split", ["train", "val"])
def test_c_class_parity(dataset, split):
    ref = _run_reference("charades_ver2_c_class", dataset, split=split)
    got = ours.prepare_c_class(
        dataset["labels"], dataset["frame_counts"], split, TEMPORAL, GAP,
        rgb_root=dataset["rgb"],
    )
    _cmp(ref.data, got, ["s_targets", "c_targets"])


def test_my_pred_parity(dataset):
    ref = _run_reference("charades_my_pred", dataset, temporal=7)
    got = ours.prepare_my_pred(
        ours.MYVIDEO_LABELS, {"YUME0": 600}, 7, GAP, rgb_root=dataset["rgb"]
    )
    _cmp(ref.data, got, ["s_targets", "o_targets", "v_targets"])


def test_myvideo_parity(dataset):
    ref = _run_reference("myvideo", dataset)
    got = ours.prepare_myvideo(
        ours.MYVIDEO_LABELS, {"YUME0": 600}, TEMPORAL, GAP,
        rgb_root=dataset["rgb"],
    )
    _cmp(ref.data, got, ["s_targets", "o_targets", "v_targets"])


def test_myvideo_ver3_parity(dataset):
    ref = _run_reference("myvideo_ver3", dataset)
    got = ours.prepare_myvideo_ver3(
        ours.MYVIDEO_LABELS, {"YUME0": 600}, TEMPORAL, GAP,
        rgb_root=dataset["rgb"],
    )
    _cmp(ref.data, got, ["o_targets", "v_targets"])


def test_myvideo_c_class_parity(dataset):
    ref = _run_reference("myvideo_c_class", dataset)
    got = ours.prepare_myvideo_c_class(
        ours.MYVIDEO_LABELS, {"YUME0": 600}, TEMPORAL, GAP,
        rgb_root=dataset["rgb"],
    )
    _cmp(ref.data, got, ["s_targets", "c_targets"])


def _assert_batches_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=k
        )


def test_collates_golden_vs_reference_fields(dataset):
    """Batch collates fed the GENUINE reference prepare() fields produce
    byte-identical batches to ours — grounding the batch-level rules
    (−1→0 clamp, length selection, future-step choice) in reference data.
    (The reference itself never default-collates these variants: torch's
    collate cannot stack v1's variable-length paths, so batch assembly is
    necessarily new surface; this pins it to reference per-sample fields.)"""
    from ctc_tpu.data.loaders._common import filter_samples
    from ctc_tpu.data.loaders.charades import collate_v1
    from ctc_tpu.data.loaders.charades_ver2 import collate_ver2
    from ctc_tpu.data.loaders.charades_ver2_c_class import collate_c_class
    from ctc_tpu.data.loaders.charades_ver3 import collate_ver3

    # ver2: fixed-size multi-hot o paths
    ref = _run_reference("charades_ver2", dataset)
    got = ours.prepare_ver2(
        dataset["labels"], dataset["frame_counts"], TEMPORAL, GAP, NUM_TRANS,
        rgb_root=dataset["rgb"],
    )
    n = len(got["ids"])
    feats = np.zeros((n, TEMPORAL, 4), np.float32)
    _assert_batches_equal(
        collate_ver2(ref.data, range(n), feats),
        collate_ver2(got, range(n), feats),
    )

    # ver3: final-step ce and bce targets
    ref3 = _run_reference("charades_ver3", dataset)
    got3 = ours.prepare_ver3(
        dataset["labels"], dataset["frame_counts"], "train", TEMPORAL, GAP,
        NUM_TRANS, rgb_root=dataset["rgb"],
    )
    n3 = len(got3["ids"])
    feats3 = np.zeros((n3, TEMPORAL, 4), np.float32)
    for loss in ("ce", "bce"):
        _assert_batches_equal(
            collate_ver3(ref3.data, range(n3), feats3, loss),
            collate_ver3(got3, range(n3), feats3, loss),
        )

    # c_class: 157-class index paths
    refc = _run_reference("charades_ver2_c_class", dataset)
    gotc = ours.prepare_c_class(
        dataset["labels"], dataset["frame_counts"], "train", TEMPORAL, GAP,
        rgb_root=dataset["rgb"],
    )
    nc = len(gotc["ids"])
    featsc = np.zeros((nc, TEMPORAL, 4), np.float32)
    _assert_batches_equal(
        collate_c_class(refc.data, range(nc), featsc),
        collate_c_class(gotc, range(nc), featsc),
    )

    # v1: variable-length paths, single-timestamp videos filtered identically
    ref1 = _run_reference("charades", dataset)
    got1 = ours.prepare_v1(
        dataset["labels"], dataset["frame_counts"], TEMPORAL, GAP,
        rgb_root=dataset["rgb"],
    )
    keep = [i for i, t in enumerate(got1["times"]) if int(t) >= 2]
    ref1_f = filter_samples({k: list(v) for k, v in ref1.data.items()}, keep)
    got1_f = filter_samples(got1, keep)
    n1 = len(got1_f["ids"])
    feats1 = np.zeros((n1, TEMPORAL, 4), np.float32)
    _assert_batches_equal(
        collate_v1(ref1_f, range(n1), feats1),
        collate_v1(got1_f, range(n1), feats1),
    )
