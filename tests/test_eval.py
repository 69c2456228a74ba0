"""Eval-metric parity vs the genuine reference utils (numpy-only modules)."""

import numpy as np
import pytest

from ctc_tpu.eval import (
    charades_map,
    compose_ov_predictions,
    compose_predictions,
    eval_tagging_scores,
    eval_visual_relation,
    mean_average_precision,
    voc_ap,
)


@pytest.fixture(scope="module")
def ref_utils():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    np.NINF = -np.inf  # numpy-2 shim for the reference's np.NINF usage
    import importlib

    ref_map = importlib.import_module("utils.map")
    ref_init = importlib.import_module("utils")
    return ref_map, ref_init


def test_map_parity(rng, ref_utils):
    ref_map, _ = ref_utils
    scores = rng.standard_normal((50, 12))
    gt = (rng.random((50, 12)) < 0.2).astype(np.int64)
    gt[:, 3] = 0  # a class with no positives -> NaN path
    want = ref_map.map(scores, gt)
    got = mean_average_precision(scores, gt)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-10)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-10)
    np.testing.assert_allclose(got[2], want[2], rtol=1e-10)


def test_charades_map_parity(rng, ref_utils):
    ref_map, _ = ref_utils
    scores = rng.standard_normal((40, 8))
    gt = (rng.random((40, 8)) < 0.25).astype(np.int64)
    gt[5] = 0
    gt[17] = 0  # empty-gt rows get NINF-masked
    want = ref_map.charades_map(scores, gt)
    got = charades_map(scores, gt)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-10)
    np.testing.assert_allclose(got[2], want[2], rtol=1e-10)


def _random_relations(rng, n_vids=6):
    gt, pred = {}, {}
    for v in range(n_vids):
        vid = f"vid{v}"
        gt[vid] = [
            tuple(int(x) for x in rng.integers(0, 5, size=3))
            for _ in range(int(rng.integers(1, 6)))
        ]
        pred[vid] = sorted(
            [
                (
                    float(rng.standard_normal()),
                    tuple(int(x) for x in rng.integers(0, 5, size=3)),
                )
                for _ in range(int(rng.integers(3, 30)))
            ],
            key=lambda x: x[0],
            reverse=True,
        )
    return gt, pred


def test_relation_tagging_parity(rng, ref_utils):
    _, ref = ref_utils
    gt, pred = _random_relations(rng)
    for vid in gt:
        p_ref, r_ref, s_ref = ref.eval_tagging_scores(gt[vid], pred[vid])
        p, r, s = eval_tagging_scores(gt[vid], pred[vid])
        np.testing.assert_allclose(p, p_ref)
        np.testing.assert_allclose(r, r_ref)
        np.testing.assert_allclose(s, s_ref)

    want = ref.eval_visual_relation(pred, gt)
    got = eval_visual_relation(pred, gt)
    np.testing.assert_allclose(got[0], want[0])
    assert {k: round(v, 9) for k, v in got[1].items()} == {
        k: round(float(v), 9) for k, v in want[1].items()
    }
    assert {k: round(v, 9) for k, v in got[2].items()} == {
        k: round(float(v), 9) for k, v in want[2].items()
    }


def test_voc_ap_parity(rng, ref_utils):
    _, ref = ref_utils
    rec = np.sort(rng.random(20))
    prec = rng.random(20)
    np.testing.assert_allclose(voc_ap(rec, prec), ref.voc_ap(rec, prec))
    np.testing.assert_allclose(
        voc_ap(rec, prec, True), ref.voc_ap(rec, prec, True)
    )


def test_compose_predictions_parity(rng, ref_utils):
    _, ref = ref_utils
    s = rng.standard_normal(16)
    o = rng.standard_normal(38)
    v = rng.standard_normal(33)
    want = ref.get_predictions(s, o, v)
    got = compose_predictions(s, o, v)
    assert len(got) == len(want)
    # same score multiset and same top triplet score
    np.testing.assert_allclose(
        sorted(x[0] for x in got), sorted(float(x[0]) for x in want)
    )
    np.testing.assert_allclose(got[0][0], float(want[0][0]))
    assert got[0][1] == tuple(int(i) for i in want[0][1])

    want2 = ref.get_ov_predictions(o, v)
    got2 = compose_ov_predictions(o, v)
    np.testing.assert_allclose(
        sorted(x[0] for x in got2), sorted(float(x[0]) for x in want2)
    )
