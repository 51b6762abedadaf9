"""ctypes bindings for the native (C++) ExMy codec.

``runtime/libexmy_codec.so`` is an independent C++ implementation of the
quantization numerics, used as a cross-language bit-exactness oracle and for
host-side tooling that must not depend on JAX. Builds on demand via make
(g++); all entry points gracefully report unavailability instead of raising
at import.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime",
)
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libexmy_codec.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _RUNTIME_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native codec; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.exmy_decompose.argtypes = [f32p, i32p, i32p, i64, i32, i32, i32, i32]
    lib.exmy_compose.argtypes = [i32p, i32p, f32p, f32p, i64, i32, i32]
    lib.exmy_quantize.argtypes = [f32p, f32p, i64, i32, i32, i32, i32]
    lib.fp8_ste_quantize.argtypes = [
        f32p, f32p, i64, i32, ctypes.c_float, i32, i32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def exmy_quantize(x: np.ndarray, expo_width: int, mant_width: int, bias: int,
                  clip_of: bool = True) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native codec unavailable (g++/make missing?)")
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(x)
    lib.exmy_quantize(x.ravel(), out.ravel(), x.size, expo_width, mant_width,
                      bias, int(clip_of))
    return out


def exmy_decompose(x: np.ndarray, expo_width: int, mant_width: int, bias: int,
                   clip_of: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    lib = load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    x = np.ascontiguousarray(x, np.float32)
    expo = np.empty(x.shape, np.int32)
    mant = np.empty(x.shape, np.int32)
    lib.exmy_decompose(x.ravel(), expo.ravel(), mant.ravel(), x.size,
                       expo_width, mant_width, bias, int(clip_of))
    return expo, mant


def fp8_ste_quantize(x: np.ndarray, n_bits: int, maxval: float,
                     mant_bits: int, sign_bits: int
                     ) -> Tuple[np.ndarray, int]:
    lib = load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(x)
    bias = ctypes.c_int32(0)
    lib.fp8_ste_quantize(x.ravel(), out.ravel(), x.size, n_bits,
                         ctypes.c_float(maxval), mant_bits, sign_bits,
                         ctypes.byref(bias))
    return out, int(bias.value)
