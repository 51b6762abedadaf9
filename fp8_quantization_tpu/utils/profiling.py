"""Profiling: jax.profiler traces + per-op roofline accounting.

The reference's tracing story is a context-manager stopwatch and tqdm bars
(SURVEY.md §5.1); TPU-natively we expose:

* ``trace`` — capture a jax.profiler trace (view in XProf/TensorBoard);
* ``benchmark`` — pipelined-dispatch wall-clock timing of a jitted fn;
* ``roofline`` — achieved fraction of peak FLOPs / HBM bandwidth so every
  hot kernel can be held to its speed-of-light.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax

# Peak numbers per chip, by the platform's device kind. v5e (aka v5 lite):
# 197 bf16 TFLOP/s, ~819 GB/s HBM BW.
PEAKS: Dict[str, Dict[str, float]] = {
    "TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "TPU v6 lite": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0},
}


def device_peaks(device=None) -> Dict[str, float]:
    device = device or jax.devices()[0]
    for key, peaks in PEAKS.items():
        if key.lower() in device.device_kind.lower():
            return peaks
    return {"bf16_tflops": float("nan"), "hbm_gbps": float("nan")}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace around a block (open with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, iters: int = 100, repeats: int = 3) -> float:
    """Best-of-N pipelined wall-clock seconds per call of a jitted fn."""
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def roofline(
    seconds_per_call: float,
    flops: float = 0.0,
    bytes_accessed: float = 0.0,
    device=None,
) -> Dict[str, float]:
    """Achieved TFLOP/s + GB/s and their fractions of the chip peaks."""
    peaks = device_peaks(device)
    tflops = flops / seconds_per_call / 1e12 if flops else 0.0
    gbps = bytes_accessed / seconds_per_call / 1e9 if bytes_accessed else 0.0
    return {
        "seconds_per_call": seconds_per_call,
        "tflops": tflops,
        "gbps": gbps,
        "flops_fraction_of_peak": tflops / peaks["bf16_tflops"],
        "bw_fraction_of_peak": gbps / peaks["hbm_gbps"],
    }
