#!/usr/bin/env python
"""Tile-config sweep for the fused Pallas approx-matmul kernel on real TPU.

Times approx_matmul_pallas at 512^3 (the ROADMAP reference point) across
(bm, bn, bk, kc) tile configs with the slope method (chained fori_loop,
scalar readback; see bench.py). Run on the tunneled chip:

    python scripts/sweep_approx_tiles.py [--size 512] [--configs default]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--depths", type=int, nargs=2, default=(2, 8))
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    from fp8_quantization_tpu.numerics.codec import quantize_exmy
    from fp8_quantization_tpu.ops.pallas.approx_matmul import approx_matmul_pallas

    s = args.size
    rng = np.random.default_rng(0)
    a = quantize_exmy(jnp.asarray(rng.normal(size=(s, s)), jnp.float32), 3, 4, 4)
    b = quantize_exmy(jnp.asarray(rng.normal(size=(s, s)), jnp.float32), 3, 4, 4)
    bias_b = jnp.full((s,), 4, jnp.int32)

    configs = [
        # (bm, bn, bk, kc)
        (256, 256, 256, 8),    # current default
        (256, 256, 256, 16),
        (256, 256, 256, 4),
        (128, 256, 256, 8),
        (256, 512, 256, 8),
        (128, 512, 512, 8),
        (512, 256, 256, 8),
        (256, 256, 512, 8),
        (128, 128, 128, 8),
    ]

    def build(n, bm, bn, bk, kc):
        @jax.jit
        def f(a, b, bias_b):
            def body(_, acc):
                out = approx_matmul_pallas(
                    acc, b, 4, bias_b, 4, expo_width=3, mant_width=4,
                    with_comp=True, with_approx=True,
                    quant_btw_mult_accu=True,
                    bm=bm, bn=bn, bk=bk, kc=kc,
                )
                return out * 0.001  # keep magnitudes sane across the chain
            return lax.fori_loop(0, n, body, a).sum()
        return f

    results = []
    for bm, bn, bk, kc in configs:
        try:
            ts = {}
            for n in args.depths:
                f = build(n, bm, bn, bk, kc)
                float(f(a, b, bias_b))  # compile + warm
                best = float("inf")
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    float(f(a, b, bias_b))
                    best = min(best, time.perf_counter() - t0)
                ts[n] = best
            n0, n1 = args.depths
            per_iter = (ts[n1] - ts[n0]) / (n1 - n0)
            results.append((per_iter, (bm, bn, bk, kc)))
            print(f"bm={bm:4d} bn={bn:4d} bk={bk:4d} kc={kc:3d}: "
                  f"{per_iter * 1e3:8.3f} ms/iter", flush=True)
        except Exception as e:  # VMEM overflow etc.
            print(f"bm={bm:4d} bn={bn:4d} bk={bk:4d} kc={kc:3d}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)

    if results:
        results.sort()
        best_t, best_cfg = results[0]
        print(f"\nbest: bm={best_cfg[0]} bn={best_cfg[1]} bk={best_cfg[2]} "
              f"kc={best_cfg[3]} at {best_t * 1e3:.3f} ms/iter "
              f"({2 * s**3 / best_t / 1e9:.2f} sim-GFLOP/s)")


if __name__ == "__main__":
    main()
