"""Product-loop demo of --steps-per-dispatch on the real chip: the same
CLI training run at K=1 and K=8 (synthetic features, B=256, reference
geometry). Records per-epoch wall clock and asserts identical losses.
Writes DISPATCH_DEMO_r4.json. TPU-claiming python: run alone."""

import json
import time


def run(k):
    from ctc_tpu.cli.main import main

    t0 = time.time()
    hist = main([
        "--dataset", "synthetic", "--epochs", "8", "--batch-size", "256",
        "--temporal", "10", "--extract-feat-dim", "1024", "--v-class", "33",
        "--dropout", "0.0", "--lr", "0.003",
        "--cache-dir", "/tmp/dispatch_demo", "--name", f"k{k}",
        "--print-train-freq", "100", "--print-test-freq", "100",
        "--steps-per-dispatch", str(k),
    ])
    wall = time.time() - t0
    return [h["train"]["loss"] for h in hist], wall


def main():
    # K=1 first (programs warm from prior rounds), then K=8 (fresh compile
    # counted separately from the steady-state epochs)
    out = {}
    for k in (1, 8):
        losses, wall = run(k)
        # steady-state: repeat once now that everything is compiled
        losses2, wall2 = run(k)
        assert losses == losses2
        out[f"k{k}"] = {"train_losses": [round(x, 6) for x in losses],
                        "wall_first_s": round(wall, 2),
                        "wall_warm_s": round(wall2, 2)}
        print(f"K={k}: warm wall {wall2:.2f}s for 8 epochs x 8 steps",
              flush=True)
    assert out["k1"]["train_losses"] == out["k8"]["train_losses"], out
    out["note"] = ("identical losses; warm wall covers 64 train steps + "
                   "16 eval steps + checkpoints/CSV per run")
    with open("DISPATCH_DEMO_r4.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
