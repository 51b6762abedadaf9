"""Model inspection: per-layer weight distributions and quant-state summary.

~ reference ``hooks/hook_demo.py:134-202`` (module traversal + matplotlib
weight histograms). Works on the variables pytree; plotting is optional
(matplotlib may be absent) — the numeric summaries always work.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np


def weight_summaries(params: dict) -> List[Dict]:
    """Flatten the params tree into per-tensor summary stats."""
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        arr = np.asarray(leaf)
        if arr.ndim == 0:
            continue
        rows.append({
            "name": name,
            "shape": tuple(arr.shape),
            "min": float(arr.min()),
            "max": float(arr.max()),
            "mean": float(arr.mean()),
            "std": float(arr.std()),
            "abs_max": float(np.abs(arr).max()),
        })
    return rows


def quant_state_summary(variables: dict) -> List[Dict]:
    """Per-site quantizer parameters (maxval ranges, elected mantissa bits)."""
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(
        variables.get("quant", {})
    ):
        name = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        arr = np.asarray(leaf)
        rows.append({
            "name": name,
            "shape": tuple(arr.shape),
            "min": float(arr.min()) if arr.size else None,
            "max": float(arr.max()) if arr.size else None,
        })
    return rows


def weight_histograms(
    params: dict,
    out_dir: str,
    bins: int = 101,
    select: Optional[str] = None,
) -> List[Tuple[str, str]]:
    """Write per-layer weight histogram PNGs (hook_demo.py analog).

    Returns (tensor_name, file_path) pairs; skips silently if matplotlib is
    unavailable.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return []

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        if select and select not in name:
            continue
        arr = np.asarray(leaf).ravel()
        if arr.size < 2:
            continue
        fig, ax = plt.subplots(figsize=(6, 3))
        ax.hist(arr, bins=bins)
        ax.set_title(f"{name}  {tuple(np.asarray(leaf).shape)}")
        fname = os.path.join(out_dir, name.replace("/", "_") + ".png")
        fig.savefig(fname, dpi=80, bbox_inches="tight")
        plt.close(fig)
        written.append((name, fname))
    return written
