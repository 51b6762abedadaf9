"""Small utilities: timing, seeding, schedules.

~ reference ``utils/stopwatch.py`` and ``utils/utils.py`` (seed_all :201-256,
CosineTempDecay :283-294). JAX randomness is explicit-key based, so seeding
covers python/numpy plus a root jax key derivation.
"""

from __future__ import annotations

import random
import time
from typing import Optional

import jax
import numpy as np


class Stopwatch:
    """Context-manager / start-stop timer (utils/stopwatch.py:9-83)."""

    def __init__(self, verbose: bool = False):
        self._start: Optional[float] = None
        self._elapsed = 0.0
        self.verbose = verbose

    def start(self):
        if self._start is None:
            self._start = time.perf_counter()
        return self

    def stop(self):
        if self._start is not None:
            self._elapsed += time.perf_counter() - self._start
            self._start = None
        return self

    def reset(self):
        self._start = None
        self._elapsed = 0.0
        return self

    def get_total_duration(self) -> float:
        extra = time.perf_counter() - self._start if self._start is not None else 0.0
        return self._elapsed + extra

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
        if self.verbose:
            print(f"elapsed: {self.get_total_duration():.4f}s")


def seed_all(seed: int) -> jax.Array:
    """Seed python/numpy and derive the root jax PRNG key
    (utils/utils.py:201-256; JAX computations are deterministic by default,
    the cudnn knobs have no analog)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


class CosineTempDecay:
    """Cosine annealing schedule for regularizer weights
    (utils/utils.py:283-294)."""

    def __init__(self, t_max: int, temp_range=(20.0, 2.0), rel_decay_start: float = 0):
        self.t_max = t_max
        self.start_temp, self.end_temp = temp_range
        self.decay_start = rel_decay_start * t_max

    def __call__(self, t):
        if t < self.decay_start:
            return self.start_temp
        rel_t = (t - self.decay_start) / (self.t_max - self.decay_start)
        return self.end_temp + 0.5 * (self.start_temp - self.end_temp) * (
            1 + np.cos(rel_t * np.pi)
        )


def approx_compiler_options(model=None) -> Optional[dict]:
    """Per-jit ``compiler_options`` required to compile approx-multiplier
    CONV models on TPU (round-5 measured fact, docs/PERF_NOTES.md "Approx
    E2E"): XLA may place a Pallas approx-kernel OUTPUT buffer in scoped
    VMEM (S(1)) when the custom call feeds a fusion inside a large jitted
    body, and several MobileNetV2 conv shapes exceed the default 16 MiB
    scoped limit even after the kernel wrapper's large-M ``lax.map`` split
    (ops/pallas/approx_matmul.py ``m_split``). Raising the scoped limit to
    64 MiB is safe on the v5e (128 MiB VMEM).

    Returns the options dict when ``model`` (if given) is armed for the
    approx special path AND the default backend is a TPU, else ``None`` —
    the option must NOT reach CPU compiles: the CPU plugin rejects unknown
    TPU-only flags (which is also why ``XLA_FLAGS`` cannot carry it — the
    local CPU plugin parses XLA_FLAGS at interpreter startup and fatals).
    Pass the result straight to ``jax.jit(compiler_options=...)``; ``None``
    is accepted and means "no override".
    """
    if model is not None:
        qc = getattr(model, "qc", None)
        rm = getattr(qc, "run_method", None)
        if not (getattr(rm, "approx_flag", False)
                and getattr(qc, "approx", None) is not None):
            return None
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": 65536}
