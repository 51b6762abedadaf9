"""Native (C++ threaded) image loading pipeline.

``runtime/libimage_loader.so`` decodes JPEG/PNG (libjpeg/libpng) and runs the
validation preprocess (PIL-style triangle resize -> center crop -> normalize,
matching ``eval/data.py::preprocess_val`` / the reference transform,
imagenet_dataloaders.py:60-70) for a whole batch inside a C++ thread pool —
the native replacement for the reference's torch DataLoader worker processes.

Falls back gracefully: ``available()`` is False when the library can't build
(missing g++/libjpeg), and callers should use the PIL pipeline then.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from .data import IMAGENET_MEAN, IMAGENET_STD, _list_val_samples

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime",
)
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libimage_loader.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _RUNTIME_DIR, "libimage_loader.so"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native loader; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32 = ctypes.c_int32

    lib.il_preprocess_file.argtypes = [
        ctypes.c_char_p, i32, f32p, f32p, f32p]
    lib.il_preprocess_file.restype = i32
    lib.il_preprocess_batch.argtypes = [
        ctypes.c_char_p, i32, i32, f32p, f32p, f32p, i32p, i32]
    lib.il_preprocess_batch.restype = None
    lib.il_decode_file.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_int64,
        ctypes.POINTER(i32), ctypes.POINTER(i32)]
    lib.il_decode_file.restype = i32
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def decode_file(path: str, max_side: int = 8192
                ) -> Tuple[np.ndarray, int, int]:
    """Raw RGB8 decode (test/tooling aid). Returns (rgb (H,W,3), w, h)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native image loader unavailable")
    buf = np.empty(max_side * max_side * 3, np.uint8)
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    rc = lib.il_decode_file(path.encode(), buf, buf.size,
                            ctypes.byref(w), ctypes.byref(h))
    if rc:
        raise IOError(f"decode failed ({rc}): {path}")
    rgb = buf[: w.value * h.value * 3].reshape(h.value, w.value, 3).copy()
    return rgb, w.value, h.value


def preprocess_files(paths: Sequence[str], image_size: int = 224,
                     num_threads: int = 0) -> np.ndarray:
    """Decode + preprocess a batch of files in the C++ thread pool.

    Returns (N, S, S, 3) float32 NHWC normalized batch. Raises on the first
    failed file. ``num_threads=0`` uses the hardware thread count.
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native image loader unavailable")
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.float32)
    status = np.zeros((n,), np.int32)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    lib.il_preprocess_batch(blob, n, image_size, IMAGENET_MEAN, IMAGENET_STD,
                            out, status, num_threads)
    bad = np.nonzero(status)[0]
    if bad.size:
        raise IOError(f"decode failed ({status[bad[0]]}): {paths[bad[0]]}")
    return out


def imagenet_val_batches_native(
    images_dir: str,
    batch_size: int,
    image_size: int = 224,
    max_batches: Optional[int] = None,
    num_threads: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Native-pipeline twin of ``data.imagenet_val_batches``."""
    samples = _list_val_samples(os.path.join(images_dir, "val"))
    produced = 0
    for i in range(0, len(samples), batch_size):
        chunk = samples[i:i + batch_size]
        if len(chunk) < batch_size and produced:
            pass  # final partial batch still yields (matches PIL pipeline)
        paths = [p for p, _ in chunk]
        labels = np.asarray([lab for _, lab in chunk], np.int32)
        yield preprocess_files(paths, image_size, num_threads), labels
        produced += 1
        if max_batches is not None and produced >= max_batches:
            return
