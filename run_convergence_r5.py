"""Re-recorded BINARY (north-star) convergence run with an
OBJECTIVE-ALIGNED path metric (VERDICT r4 missing #2 / next #3).

The r4 binary record honestly annotated that final-step argmax top-1 sits
below chance while the loss falls 15x — the binary loss fits the multi-hot
transition PATH, which top-1 does not measure.  This run records the
instrument that does: the DTW transition metric family
(``--transition-metrics`` -> ``train/metrics.py::transition_accuracy`` /
``transition_recall``, the reference's accuracy_time/recall_time intent,
/root/reference/train.py:556-584) per epoch, plus a final greedy-decode
edit-distance comparison (the ``--evaluate --decode`` product surface)
against the synthetic gt paths for the trained vs untrained model.

One `python -m ctc_tpu.cli.main` invocation on the chip (synthetic
learnable features at reference scale, Pallas kernels, orbax checkpoints,
guards active).  Writes docs/CONVERGENCE_R5.md + CSVs.
TPU-claiming python: run alone (nohup + log).
"""

import csv
import json
import os
import shutil
import time

CACHE = "/tmp/convergence_r5"
EPOCHS = 20

ARGS = [
    "--dataset", "synthetic", "--epochs", str(EPOCHS),
    "--batch-size", "256", "--temporal", "10",
    "--extract-feat-dim", "1024",
    "--lr", "0.003", "--lr-decay-rate", "8",
    "--cache-dir", CACHE, "--name", "binary",
    "--print-train-freq", "4",
    "--skip-nonfinite", "--max-restarts", "1",
    "--transition-metrics",
    "--loss", "binary", "--o-class", "38",
]


def edit_distance(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def decoded_vs_gt(decoded_csv):
    """Mean normalized edit distance of the decoded object paths vs the
    synthetic val gt (argmax of the multi-hot path rows)."""
    import numpy as np

    from ctc_tpu.config import parse
    from ctc_tpu.data.loaders import synthetic as synth

    cfg = parse(ARGS)
    _, val = synth.get(cfg)
    gt = []
    for b in val:
        paths = np.asarray(b["paths"])  # [B, L, C] multi-hot
        tl = np.asarray(b["target_lengths"])
        for i in range(paths.shape[0]):
            gt.append(list(np.argmax(paths[i, : tl[i]], axis=1)))
    rows = list(csv.reader(open(decoded_csv)))[1:]
    assert len(rows) == len(gt), (len(rows), len(gt))
    dists = []
    for row, g in zip(rows, gt):
        dec = [int(x) for x in row[3].split()] if row[3] else []
        dists.append(edit_distance(dec, g) / max(len(g), 1))
    return float(np.mean(dists))


def main():
    from ctc_tpu.cli.main import main as cli_main

    t0 = time.time()
    history = cli_main(ARGS)
    wall = time.time() - t0

    # decode with the TRAINED checkpoint, and with a FRESH init as the
    # no-learning baseline (same decode surface, untrained weights)
    m_trained = cli_main(ARGS + [
        "--evaluate", "--decode", "--resume", os.path.join(CACHE, "binary"),
        "--name", "binary_eval",
    ])
    m_fresh = cli_main(ARGS + [
        "--evaluate", "--decode", "--name", "binary_fresh",
    ])
    ed_trained = decoded_vs_gt(m_trained["decoded_csv"])
    ed_fresh = decoded_vs_gt(m_fresh["decoded_csv"])

    rows = [
        {
            "epoch": i,
            "train_loss": round(h["train"]["loss"], 4),
            "val_loss": round(h["val"]["loss"], 4),
            "trans_top1": round(h["val"]["trans_top1"], 2),
            "trans_top5": round(h["val"]["trans_top5"], 2),
            "recall_top1": round(h["val"]["recall_top1"], 2),
            "val_top5": round(h["val"]["top5"], 2),
        }
        for i, h in enumerate(history)
    ]
    lines = [
        "# Binary convergence, re-recorded with path-level metrics "
        "(round 5, real TPU v5e)",
        "",
        "The r4 record (docs/CONVERGENCE_R4.md) noted that final-step",
        "argmax top-1 does not measure what NoBlankBinaryCTC optimizes",
        "(the multi-hot transition path).  This run records the",
        "objective-aligned instruments: per-epoch DTW transition",
        "accuracy/recall over the full logit sequence vs the label paths",
        "(`--transition-metrics`), and a final greedy-decode",
        "edit-distance against the gt paths (`--evaluate --decode`).",
        "Same chip config as r4: synthetic learnable features at",
        "reference scale (B=256, T=10, F=1024, o=38 multi-hot), Pallas",
        "lattice kernels, Adam + step decay, orbax checkpoints,",
        "`--skip-nonfinite --max-restarts 1` active.",
        "",
        f"{EPOCHS} epochs in {wall:.0f}s wall.",
        "",
        "| epoch | train loss | val loss | trans top-1 | trans top-5 | "
        "recall top-1 | val top-5 |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['epoch']} | {r['train_loss']} | {r['val_loss']} | "
            f"{r['trans_top1']} | {r['trans_top5']} | {r['recall_top1']} | "
            f"{r['val_top5']} |"
        )
    first, last = rows[0], rows[-1]
    lines += [
        "",
        f"Greedy-decoded object paths vs gt (mean normalized edit "
        f"distance, lower is better): **{ed_trained:.3f} trained** vs "
        f"**{ed_fresh:.3f} untrained** (same decode surface, fresh-init "
        f"weights).",
        "",
        f"Loss falls "
        f"{first['train_loss'] / max(last['train_loss'], 1e-9):.1f}x; "
        f"DTW transition top-1 {first['trans_top1']} -> "
        f"{last['trans_top1']} across epochs (top-5 {first['trans_top5']} "
        f"-> {last['trans_top5']}).  Judge path learning against the "
        "UNTRAINED baseline and chance levels — see the honest-dynamics",
        "note added to docs/CONVERGENCE_R5.md after the recorded run.",
        "Raw CSVs: `docs/convergence_r5/binary/`.",
    ]
    os.makedirs("docs/convergence_r5/binary", exist_ok=True)
    for name in ("train_log.csv", "test_log.csv", "score.csv"):
        src = os.path.join(CACHE, "binary", name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join("docs/convergence_r5/binary",
                                          name))
    shutil.copy(m_trained["decoded_csv"],
                "docs/convergence_r5/binary/decoded_trained.csv")
    with open("docs/CONVERGENCE_R5.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    summary = {
        "wall_s": wall,
        "first_train_loss": first["train_loss"],
        "final_train_loss": last["train_loss"],
        "trans_top1_first": first["trans_top1"],
        "trans_top1_final": last["trans_top1"],
        "edit_dist_trained": ed_trained,
        "edit_dist_fresh": ed_fresh,
    }
    assert last["train_loss"] < first["train_loss"] * 0.8
    # path learning is judged against the UNTRAINED baseline (epoch-0 val
    # runs after a full epoch of training, and transition top-1 peaks
    # early then trades argmax sharpness for path likelihood — see the
    # honest-dynamics note in docs/CONVERGENCE_R5.md)
    assert ed_trained < ed_fresh
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
