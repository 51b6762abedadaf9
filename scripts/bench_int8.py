"""INT8-MXU quantized matmul chain benchmark.

Measures the uniform-quantizer serving path (``quantize_acts_int8`` ->
native int8 dot -> scale epilogue) chained K times, against the plain bf16
matmul chain — the same slope-timing protocol as bench.py. The v5e MXU runs
int8 at 2x bf16 FLOPs, so this path is the only one that can beat the bf16
speed-of-light that bounds the FP8-simulation fast path.

Round 4: chains ROTATE through weight slabs exceeding the 128 MB VMEM
(int8: 12 x 16 MB; bf16: 6 x 32 MB) so loop-invariant weights cannot stay
VMEM-resident — same integrity rule as bench.py (earlier readings were
VMEM-flattered).

Run: python scripts/bench_int8.py [--size 4096]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fp8_quantization_tpu.ops.fastpath import (
    Int8Weights,
    quantize_acts_int8,
    quantized_matmul_int8,
)

DEPTHS = (4, 20)
REPEATS = 5


def slope(build, *args):
    ts = {}
    for n in DEPTHS:
        f = build(n)
        float(f(*args))
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    n0, n1 = DEPTHS
    return (ts[n1] - ts[n0]) / (n1 - n0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    args = ap.parse_args()
    m = k = n = args.size

    N_I8, N_BF = 12, 6  # slab counts: both stacks exceed the 128 MB VMEM
    wi = jax.jit(lambda: (jax.random.normal(jax.random.key(0), (N_I8, k, n))
                          * 30).astype(jnp.int8))()
    wsum = jnp.sum(wi.astype(jnp.int32), axis=1)          # (S, N)
    scale = jnp.full((n,), 2.0 ** -12, jnp.float32)
    zpv = jnp.full((n,), 128.0, jnp.float32)
    w16 = wi[:N_BF].astype(jnp.bfloat16)
    x = jax.jit(lambda: jax.random.normal(jax.random.key(1), (m, k),
                                          jnp.float32))()
    sx = jnp.float32(2.0 ** -5)
    zp = jnp.float32(0.0)
    lo, hi = jnp.float32(-128.0), jnp.float32(127.0)

    def int8_chain(nd):
        @jax.jit
        def f(x, wi, wsum):
            def body(i, acc):
                j = i % N_I8
                w = Int8Weights(
                    codes=lax.dynamic_index_in_dim(wi, j, keepdims=False),
                    scale=scale, zp=zpv,
                    wsum=lax.dynamic_index_in_dim(wsum, j, keepdims=False))
                codes, cx = quantize_acts_int8(acc, sx, zp, lo, hi)
                # symmetric-signed weights: Xsum correction statically
                # elided, as in the original measurement
                return quantized_matmul_int8(codes, w, sx, cx)
            return lax.fori_loop(0, nd, body, x).sum()
        return f

    def bf16_chain(nd):
        @jax.jit
        def f(x, w16):
            def body(i, acc):
                w = lax.dynamic_index_in_dim(w16, i % N_BF, keepdims=False)
                return jnp.dot(acc.astype(jnp.bfloat16), w,
                               preferred_element_type=jnp.float32)
            return lax.fori_loop(0, nd, body, x).sum()
        return f

    flops = 2.0 * m * n * k
    t8 = slope(int8_chain, x, wi, wsum)
    t16 = slope(bf16_chain, x, w16)
    print(json.dumps({
        "metric": "int8_quant_matmul_tops",
        "value": round(flops / t8 / 1e12, 2),
        "unit": "TOP/s",
        "bf16_chain_tflops": round(flops / t16 / 1e12, 2),
        "vs_bf16_chain": round(t16 / t8, 4),
        "size": args.size,
    }))


if __name__ == "__main__":
    main()
