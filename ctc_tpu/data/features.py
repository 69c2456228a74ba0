"""I3D feature extraction + on-disk feature cache.

The live training path of the reference keeps the I3D frozen and only trains
the head (train.py:448-451 — the I3D optimizer step is disabled), so the
TPU-native pipeline extracts clip features ONCE (jit-batched I3D, T folded
into batch) and caches them per sample; training then streams features
(BASELINE.json config 4: "LSTM head + NoBlankCTC training loop on cached I3D
features").
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.data.frames import load_window
from ctc_tpu.models.i3d import InceptionI3d


class I3DFeatureExtractor:
    """Jitted frozen-I3D clip-feature extractor."""

    def __init__(self, variables, model: InceptionI3d | None = None):
        self.model = model or InceptionI3d()
        self._apply = jax.jit(
            lambda clips: self.model.apply(variables, clips, train=False)
        )

    def __call__(self, clips: np.ndarray) -> np.ndarray:
        """``[B, T, stack, h, w, 3] -> [B, T, 1024]``."""
        return np.asarray(self._apply(jnp.asarray(clips)))


def extract_split_features(
    data: dict,
    extractor,
    out_dir: str,
    *,
    gap: int,
    batch_size: int = 8,
    inputsize: int = 224,
):
    """Extract + memmap-cache features for every sample of a prepared split.

    Writes ``features.npy [N, T, 1024]`` into ``out_dir``; returns the array.
    Already-cached results are returned directly.
    """
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "features.npy")
    n = len(data["rgb_image_paths"])
    if os.path.exists(path):
        cached = np.load(path, mmap_mode="r")
        if cached.shape[0] == n:
            return cached
    temporal = len(data["rgb_image_paths"][0])
    feats = None
    for i0 in range(0, n, batch_size):
        idx = range(i0, min(i0 + batch_size, n))
        clips = np.stack(
            [
                load_window(
                    data["rgb_image_paths"][i], gap, inputsize=inputsize
                )
                for i in idx
            ]
        )
        out = extractor(clips)
        if feats is None:
            feats = np.zeros((n, temporal, out.shape[-1]), np.float32)
        feats[i0 : i0 + len(out)] = out
    np.save(path, feats)
    return feats
