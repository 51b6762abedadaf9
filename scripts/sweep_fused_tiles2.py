"""Second fused-kernel tile sweep: big tiles with a raised Mosaic VMEM budget.

The first sweep showed the kernel HBM-bound at the default budget (big tiles
fail remote compile). This one passes vmem_limit_bytes through a patched
fused_quant_matmul to test whether v5e's larger physical VMEM admits
compute-bound tiles.
"""

import sys
import time

sys.path.insert(0, ".")

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fp8_quantization_tpu.numerics import quantize_to_fp8_ste
from fp8_quantization_tpu.ops.pallas import fused_matmul as fm
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTHS = (4, 12)
REPEATS = 4
M = N = K = 4096


def slope(f, x16, w16, res):
    ts = {}
    for n in DEPTHS:
        g = jax.jit(lambda w, r, n=n: lax.fori_loop(
            0, n, lambda _, acc: f(acc, w, r), x16).sum())
        float(g(w16, res))
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(g(w16, res))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    n0, n1 = DEPTHS
    return (ts[n1] - ts[n0]) / (n1 - n0)


def fused(x, w_q, res_params, bm, bn, bk, vmem_mb):
    """fused_quant_matmul clone with a vmem_limit_bytes knob."""
    m, k = x.shape
    n = w_q.shape[1]
    n_k = k // bk
    z = jnp.zeros((1, 1), jnp.float32)
    zi = jnp.zeros((1, 1), jnp.int32)
    mv, bias, mant, sign = res_params
    rmax = jnp.asarray(mv, jnp.float32).reshape(1, 1)
    rbias = jnp.asarray(bias, jnp.int32).reshape(1, 1)
    rmant = jnp.asarray(mant, jnp.int32).reshape(1, 1)
    rsign = jnp.asarray(sign, jnp.int32).reshape(1, 1)
    smem = lambda: pl.BlockSpec((1, 1), lambda i, j, kk: (0, 0),
                                memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(fm._kernel, quantize_x=False, requantize_out=True,
                          n_k=n_k),
        grid=(m // bm, n // bn, n_k),
        in_specs=[
            smem(), smem(), smem(), smem(),
            smem(), smem(), smem(), smem(),
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n * 2 + m * n * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
    )(z, zi, zi, zi, rmax, rbias, rmant, rsign, x, w_q)


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32)) * 0.015625
    wq, _ = jax.jit(lambda w: quantize_to_fp8_ste(
        w, 8, jnp.max(jnp.abs(w), axis=0, keepdims=True), 4.0, 1))(w)
    w16 = wq.astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    x16 = jax.jit(lambda x: quantize_to_fp8_ste(
        x, 8, jnp.asarray([6.0]), 4.0, 1)[0].astype(jnp.bfloat16))(x)
    res = (jnp.float32(64.0), jnp.int32(2), jnp.int32(4), jnp.int32(1))
    flops = 2.0 * M * N * K

    configs = [
        (1024, 512, 1024, 100),
        (1024, 1024, 512, 100),
        (1024, 1024, 1024, 100),
        (2048, 1024, 512, 100),
        (1024, 2048, 512, 100),
        (2048, 512, 1024, 100),
        (512, 512, 4096, 100),
        (1024, 512, 2048, 100),
    ]
    for bm, bn, bk, mb in configs:
        try:
            t = slope(lambda a, w, r, bm=bm, bn=bn, bk=bk, mb=mb:
                      fused(a, w, r, bm, bn, bk, mb), x16, w16, res)
        except Exception as e:
            print(f"bm={bm:5d} bn={bn:5d} bk={bk:5d} v={mb}MB  FAILED "
                  f"{type(e).__name__}: {str(e)[:90]}", flush=True)
            continue
        tf = flops / t / 1e12
        print(f"bm={bm:5d} bn={bn:5d} bk={bk:5d} v={mb}MB  {t*1e3:7.3f} ms  "
              f"{tf:7.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
