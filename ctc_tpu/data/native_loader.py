"""ctypes bindings for the native C++ frame-decoding runtime
(native/dataloader.cpp).

``decode_frames(paths)`` decodes + preprocesses JPEGs with a C++ thread pool
(libjpeg decode, PIL-style triangle resize, center crop, normalize) — the
native replacement for the reference's DataLoader worker processes.  Falls
back to the PIL path (:mod:`ctc_tpu.data.frames`) when the shared library
isn't available.  The library auto-builds from source on first use if a
compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libctcdata.so"))
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ctc_decode_frames.restype = ctypes.c_int
        lib.ctc_decode_frames.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_frames(
    paths, *, inputsize: int = 224, num_threads: int = 0
) -> np.ndarray:
    """Decode + preprocess ``paths`` -> ``[n, inputsize, inputsize, 3]`` f32.

    Uses the C++ thread-pool pipeline when available, PIL otherwise.
    """
    lib = _load()
    if lib is None:
        from ctc_tpu.data.frames import load_frame

        return np.stack([load_frame(p, inputsize) for p in paths])
    n = len(paths)
    out = np.empty((n, inputsize, inputsize, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    resize_target = int(256.0 / 224 * inputsize)
    rc = lib.ctc_decode_frames(
        arr, n, resize_target, inputsize, num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native decode failed for {paths[rc - 1]}")
    return out


def load_window_native(anchor_paths, gap: int, *, inputsize: int = 224,
                       stack: int = 10) -> np.ndarray:
    """Native-path equivalent of :func:`ctc_tpu.data.frames.load_window`."""
    from ctc_tpu.data.frames import window_frame_paths

    flat = []
    for p in anchor_paths:
        flat.extend(window_frame_paths(p, gap, stack))
    frames = decode_frames(flat, inputsize=inputsize)
    return frames.reshape(len(anchor_paths), stack, inputsize, inputsize, 3)
