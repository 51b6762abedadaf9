"""Tile sweep for the fused Pallas quantize->matmul->requantize kernel.

Measures the steady-state chained mode (bf16 in, requantized bf16 out,
``quantize_x=False``) at 4096^3 on the real chip, with the slope-between-
depths timing from bench.py (per-dispatch timings are unreliable over the
tunneled device). Run:

    python scripts/sweep_fused_tiles.py [--size 4096]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fp8_quantization_tpu.numerics import quantize_to_fp8_ste
from fp8_quantization_tpu.ops.pallas.fused_matmul import fused_quant_matmul

DEPTHS = (4, 12)
REPEATS = 4


def slope(f, *args):
    ts = {}
    for n in DEPTHS:
        g = jax.jit(lambda *a, n=n: lax.fori_loop(
            0, n, lambda _, acc: f(acc, *a), args[0]).sum())
        float(g(*args[1:]))
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(g(*args[1:]))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    n0, n1 = DEPTHS
    return (ts[n1] - ts[n0]) / (n1 - n0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    args = ap.parse_args()
    m = n = k = args.size

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32)) * 0.015625
    wq, _ = jax.jit(lambda w: quantize_to_fp8_ste(
        w, 8, jnp.max(jnp.abs(w), axis=0, keepdims=True), 4.0, 1))(w)
    w16 = wq.astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    x16 = jax.jit(lambda x: quantize_to_fp8_ste(
        x, 8, jnp.asarray([6.0]), 4.0, 1)[0].astype(jnp.bfloat16))(x)
    res = (jnp.float32(64.0), jnp.int32(2), jnp.int32(4), jnp.int32(1))

    flops = 2.0 * m * n * k

    configs = [
        (256, 256, 512),   # current default
        (512, 512, 512),
        (512, 512, 1024),
        (512, 1024, 512),
        (1024, 512, 512),
        (512, 1024, 1024),
        (1024, 1024, 512),
        (1024, 1024, 1024),
        (512, 2048, 512),
        (2048, 512, 512),
        (256, 1024, 1024),
        (1024, 256, 1024),
    ]
    results = []
    for bm, bn, bk in configs:
        def step(acc, w16, res, bm=bm, bn=bn, bk=bk):
            return fused_quant_matmul(
                acc, w16, act_params=None, res_params=res,
                quantize_x=False, requantize_out=True,
                out_dtype=jnp.bfloat16, bm=bm, bn=bn, bk=bk)
        try:
            t = slope(step, x16, w16, res)
        except Exception as e:  # VMEM overflow etc.
            print(f"bm={bm:5d} bn={bn:5d} bk={bk:5d}  FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)
            continue
        tf = flops / t / 1e12
        results.append((tf, bm, bn, bk))
        print(f"bm={bm:5d} bn={bn:5d} bk={bk:5d}  {t*1e3:7.3f} ms  "
              f"{tf:7.1f} TF/s", flush=True)

    # XLA fastpath comparison
    from fp8_quantization_tpu.ops.fastpath import ScalarQuantParams, quantized_matmul
    resq = ScalarQuantParams(maxval=jnp.float32(64.0), bias=jnp.int32(2),
                             mant=jnp.int32(4), sign=jnp.int32(1))
    t = slope(lambda acc, w16, r: quantized_matmul(
        acc, w16, act=None, res=r, out_dtype=jnp.bfloat16), x16, w16, resq)
    print(f"XLA fastpath             {t*1e3:7.3f} ms  "
          f"{flops / t / 1e12:7.1f} TF/s", flush=True)

    if results:
        best = max(results)
        print(f"BEST: bm={best[1]} bn={best[2]} bk={best[3]} "
              f"{best[0]:.1f} TF/s")


if __name__ == "__main__":
    main()
