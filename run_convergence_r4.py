"""Recorded convergence runs on the real chip for the two losses round 3
left uncovered (VERDICT r3 item 4): **NoBlankBinaryCTC** — the BASELINE
end-to-end north-star loss (BASELINE.md:20,
/root/reference/NoBlankBinaryCTC.py:139-151) — at the reference's 38-object
multi-hot space, and **blank CTC** at the 157 combined classes
(charades_ver2_c_class geometry).

Each is one `python -m ctc_tpu.cli.main` invocation on the chip (synthetic
learnable features at reference scale, Pallas lattice kernels, orbax
checkpoints, guards active).  Writes docs/CONVERGENCE_R4.md + CSVs.
TPU-claiming python: run alone (nohup + log, not a foreground timeout).
"""

import json
import os
import shutil
import time

CACHE = "/tmp/convergence_r4"
EPOCHS = 20

RUNS = {
    "binary": {
        "args": ["--loss", "binary", "--o-class", "38"],
        "chance": 100.0 / 38,
        "desc": ("NoBlankBinaryCTC (sigmoid + BCE emissions), o=38 "
                 "multi-hot object paths — the BASELINE north-star loss"),
    },
    "blank": {
        "args": ["--loss", "blank", "--c-class", "157"],
        "chance": 100.0 / 157,
        "desc": ("standard blank CTC (torch.nn.CTCLoss semantics), "
                 "c=157 combined classes — the charades_ver2_c_class path"),
    },
}


def run_one(name, spec):
    from ctc_tpu.cli.main import main as cli_main

    t0 = time.time()
    history = cli_main([
        "--dataset", "synthetic", "--epochs", str(EPOCHS),
        "--batch-size", "256", "--temporal", "10",
        "--extract-feat-dim", "1024",
        "--lr", "0.003", "--lr-decay-rate", "8",
        "--cache-dir", CACHE, "--name", name,
        "--print-train-freq", "4",
        "--skip-nonfinite", "--max-restarts", "1",
        *spec["args"],
    ])
    wall = time.time() - t0
    rows = [
        {
            "epoch": i,
            "train_loss": round(h["train"]["loss"], 4),
            "val_loss": round(h["val"]["loss"], 4),
            "val_top1": round(h["val"]["top1"], 2),
            "val_top5": round(h["val"]["top5"], 2),
        }
        for i, h in enumerate(history)
    ]
    return rows, wall


def main():
    sections = [
        "# Recorded convergence runs (round 4, real TPU v5e)",
        "",
        "Round 3's recorded run covered only `--loss noblank`; BASELINE's",
        "end-to-end north star names **NoBlankBinaryCTC** (BASELINE.md:20).",
        "These are its chip runs for the binary and blank losses: one",
        "`python -m ctc_tpu.cli.main` invocation each — synthetic learnable",
        "features at reference scale (B=256, T=10, F=1024), Pallas lattice",
        "kernels, Adam + step-decay, per-epoch orbax checkpoints,",
        "`--skip-nonfinite --max-restarts 1` active.",
        "",
    ]
    summary = {}
    for name, spec in RUNS.items():
        print(f"=== {name} ===", flush=True)
        rows, wall = run_one(name, spec)
        best_top1 = max(r["val_top1"] for r in rows)
        sections += [
            f"## {name}: {spec['desc']}",
            "",
            f"{EPOCHS} epochs in {wall:.0f}s wall.",
            "",
            "| epoch | train loss | val loss | val top-1 | val top-5 |",
            "|---|---|---|---|---|",
        ]
        for r in rows:
            sections.append(
                f"| {r['epoch']} | {r['train_loss']} | {r['val_loss']} | "
                f"{r['val_top1']} | {r['val_top5']} |"
            )
        sections += [
            "",
            f"Best val top-1: **{best_top1}** "
            f"(chance = {spec['chance']:.1f}).",
            "",
        ]
        os.makedirs(f"docs/convergence_r4/{name}", exist_ok=True)
        for csv_name in ("train_log.csv", "test_log.csv", "score.csv"):
            src = os.path.join(CACHE, name, csv_name)
            if os.path.exists(src):
                shutil.copy(src,
                            os.path.join("docs/convergence_r4", name,
                                         csv_name))
        summary[name] = {
            "wall_s": wall,
            "best_val_top1": best_top1,
            "first_train_loss": rows[0]["train_loss"],
            "final_train_loss": rows[-1]["train_loss"],
        }
        assert rows[-1]["train_loss"] < rows[0]["train_loss"] * 0.8, rows
        assert best_top1 > 3 * spec["chance"], rows
    sections += [
        "Raw CSVs: `docs/convergence_r4/<loss>/` (train_log.csv,",
        "test_log.csv, score.csv — the reference's CSV logging channels,",
        "main.py:58-66).  The noblank-loss run is round 3's",
        "`docs/CONVERGENCE_r3.md`.",
    ]
    with open("docs/CONVERGENCE_R4.md", "w") as f:
        f.write("\n".join(sections) + "\n")
    print(json.dumps({"epochs": EPOCHS, **summary}))


if __name__ == "__main__":
    main()
