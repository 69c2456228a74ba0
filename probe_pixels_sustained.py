"""Sustained pixels-mode run: the native C++ JPEG loader feeding the real
TPU I3DLSTM train step (VERDICT r2 #6 — the loader had only a CPU
regression test before this).

Builds a synthetic Charades-shaped JPEG tree (same frame-path layout the
reference reads, charades_ctc_next_pred.py:763-764), then measures three
things at the reference clip geometry (B=10, T=10, stack=10, 224x224):

1. loader-only: native-thread-pool decode+collate seconds/batch,
2. device-only: train-step seconds/batch on a pre-decoded batch,
3. sustained e2e: epochs through LazyBatches' background prefetcher
   overlapping decode with device steps -> clips/s end-to-end and which
   side bounds the pipeline.

TPU-claiming python: run alone, under nohup (first conv compile ~9 min
unless already cached by probe_pixels_tpu.py).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_dataset(root, n_videos=12, n_frames=800, size=(320, 240)):
    """Synthetic Charades-shaped tree: labels spread over the whole video
    (onsets every ~3s) so the temporal=10 windowing (span 300 frames at
    FPS=24) finds future labels after every window — ~5 samples/video."""
    from PIL import Image

    rng = np.random.default_rng(0)
    csv_lines = [
        "id,subject,scene,quality,relevance,verified,script,objects,"
        "descriptions,actions,length"
    ]
    rgb = os.path.join(root, "rgb")
    for i in range(n_videos):
        vid = f"SUS{i:02d}"
        d = os.path.join(rgb, vid)
        os.makedirs(d, exist_ok=True)
        base = rng.integers(0, 255, (size[1], size[0], 3), np.uint8)
        img = Image.fromarray(base)
        first = os.path.join(d, f"{vid}-000001.jpg")
        img.save(first, quality=85)
        raw = open(first, "rb").read()
        for j in range(1, n_frames):
            with open(os.path.join(d, f"{vid}-{j+1:06d}.jpg"), "wb") as f:
                f.write(raw)  # identical bytes; decode cost is what matters
        acts, t0 = [], 0.8
        for _ in range(10):
            c = int(rng.integers(0, 157))
            start = t0 + float(rng.uniform(0.2, 0.8))
            acts.append(f"c{c:03d} {start:.2f} {start + 6:.2f}")
            t0 = start + 2.8
        csv_lines.append(
            f'{vid},S1,"Bedroom",5,5,1,s,o,d,"{";".join(acts)}",34'
        )
    csv_path = os.path.join(root, "train.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(csv_lines) + "\n")
    return os.path.join(rgb, ""), csv_path


def main():
    from ctc_tpu import config as config_lib
    from ctc_tpu.data.loaders import charades_pixels
    from ctc_tpu.data.native_loader import native_available
    from ctc_tpu.models.i3d_lstm import I3DLSTM
    from ctc_tpu.train import trainer as tr

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pixels_sustained"
    os.makedirs(root, exist_ok=True)
    rgb_data, csv_path = build_dataset(root)
    print(f"native loader available: {native_available()}", flush=True)

    cfg = config_lib.Config(
        rgb_data=rgb_data, train_file=csv_path, val_file=csv_path,
        dataset="charades_pixels", temporal=10, gap=2, num_trans=2,
        batch_size=10, cache_dir=os.path.join(root, "cache"), name="sus",
    ).finalize()
    train_batches, _ = charades_pixels.get(cfg)
    n_batches = len(train_batches)
    print(f"{n_batches} batches of {cfg.batch_size} clips", flush=True)
    assert n_batches >= 3, "dataset too small for a sustained run"

    # --- loader-only -----------------------------------------------------
    t0 = time.perf_counter()
    first = train_batches[0]
    for i in range(1, min(4, n_batches)):
        _ = train_batches[i]
    n_timed = min(4, n_batches)
    loader_dt = (time.perf_counter() - t0) / n_timed
    jpegs = cfg.batch_size * cfg.temporal * 10
    print(f"loader-only: {loader_dt*1e3:.0f} ms/batch "
          f"({jpegs} JPEGs -> {jpegs/loader_dt:.0f} frames/s)", flush=True)

    # --- device-only ------------------------------------------------------
    model = I3DLSTM(hidden=33, freeze_backbone=True, i3d_dtype=jnp.bfloat16)
    clips = jnp.asarray(first["feats"])
    batch0 = {k: jnp.asarray(v) for k, v in first.items()}
    t0 = time.time()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        clips, train=True,
    )
    print(f"init {time.time()-t0:.0f}s", flush=True)
    state = tr.TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tr.torch_style_adam(1e-3),
    )
    step = tr.make_train_step(model, "noblank", implementation="pallas")
    rng = jax.random.PRNGKey(2)
    t0 = time.time()
    state, metrics = step(state, batch0, rng)
    jax.block_until_ready(metrics["loss"])
    print(f"first step (compile) {time.time()-t0:.0f}s", flush=True)
    # Cycle DISTINCT decoded batches: the remote execution pool
    # content-caches repeated dispatches, and a same-batch loop has
    # measured an impossible 3.5 ms/step (analytical FLOPs alone need
    # >=15 ms at 100% MFU) — same defense as bench.py, take the slower.
    iters = 12
    # One distinct batch per iteration: a short cycle of decoded batches can
    # still collide in the pool's content cache (the synthetic JPEG tree
    # repeats frame bytes — advisor r3), so perturb each batch's clips with
    # a per-iteration epsilon like probe_pixels_diag.py does.
    base_batches = [batch0] + [
        {k: jnp.asarray(v) for k, v in train_batches[i].items()}
        for i in range(1, n_timed)
    ]
    dev_batches = [
        dict(b, feats=b["feats"] + 1e-3 * (i + 1))
        for i, b in ((i, base_batches[i % len(base_batches)])
                     for i in range(iters))
    ]
    jax.block_until_ready([b["feats"] for b in dev_batches])
    times = {}
    for label, cycle in (("same-buf", [batch0]), ("uniq-buf", dev_batches)):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(state, cycle[i % len(cycle)], rng)
        jax.block_until_ready(metrics["loss"])
        times[label] = (time.perf_counter() - t0) / iters
    device_dt = max(times.values())
    print(f"device-only: {device_dt*1e3:.1f} ms/step "
          f"(same-buf {times['same-buf']*1e3:.1f}, "
          f"uniq-buf {times['uniq-buf']*1e3:.1f})", flush=True)

    # --- sustained e2e (prefetcher overlaps decode with device) ----------
    epochs = 3
    steps = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in train_batches:  # LazyBatches.__iter__ -> Prefetcher
            state, metrics = step(
                state, {k: jnp.asarray(v) for k, v in batch.items()}, rng
            )
            steps += 1
    jax.block_until_ready(metrics["loss"])
    e2e_dt = (time.perf_counter() - t0) / steps
    clips_s = cfg.batch_size / e2e_dt
    bound = "loader" if loader_dt > device_dt else "device"
    print(f"sustained e2e: {e2e_dt*1e3:.1f} ms/step over {steps} steps "
          f"-> {clips_s:.1f} clips/s (loader {loader_dt*1e3:.0f} ms vs "
          f"device {device_dt*1e3:.1f} ms -> {bound}-bound)", flush=True)
    print("JSON:", json.dumps({
        "loader_ms_per_batch": loader_dt * 1e3,
        "device_ms_per_step": device_dt * 1e3,
        "sustained_ms_per_step": e2e_dt * 1e3,
        "sustained_clips_per_s": clips_s,
        "bound": bound,
        "native_loader": native_available(),
        "loss": float(metrics["loss"]),
    }), flush=True)


if __name__ == "__main__":
    main()
