"""Headline benchmark: fused FP8 quantize->matmul Pallas kernel throughput.

Prints ONE JSON line:
  {"metric": "fused_fp8_quant_matmul_tflops", "value": <TFLOP/s>,
   "unit": "TFLOP/s", "vs_baseline": <ratio vs plain XLA bf16 matmul>}

vs_baseline >= 1.0 means the fused quantize+matmul runs at least as fast as a
plain (unquantized) bf16 XLA matmul of the same shape on this chip — i.e. the
FP8 simulation overhead is fully hidden. The reference publishes no
throughput numbers (BASELINE.md): its kernel materializes the (M, K, N)
product tensor in HBM, so per-chip matmul speed-of-light is the honest
baseline.

Many async dispatches are queued back-to-back (single block_until_ready at
the end) so per-call host overhead is pipelined away.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.numerics import quantize_to_fp8_ste
from fp8_quantization_tpu.ops.pallas import fused_quant_matmul, quantize_weights_bf16

M = N = K = 4096
ITERS = 200
REPEATS = 3
BM, BN, BK = 512, 1024, 1024


def main():
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))

    wq, _ = jax.jit(
        lambda w: quantize_to_fp8_ste(
            w, 8, jnp.max(jnp.abs(w), axis=0, keepdims=True), 4.0, 1
        )
    )(w)
    wq16 = quantize_weights_bf16(wq)

    _, bias = jax.jit(
        lambda x: quantize_to_fp8_ste(x, 8, jnp.max(jnp.abs(x)).reshape(1), 4.0, 1)
    )(x)
    ap = (float(jnp.max(jnp.abs(x))), int(bias[0]), 4, 1)

    fused_step = jax.jit(
        lambda x, w: fused_quant_matmul(x, w, act_params=ap, bm=BM, bn=BN, bk=BK)
    )
    xla_step = jax.jit(
        lambda x, w: (x.astype(jnp.bfloat16) @ w).astype(jnp.float32)
    )

    def measure(fn):
        fn(x, wq16).block_until_ready()  # compile + warm
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            r = None
            for _ in range(ITERS):
                r = fn(x, wq16)
            r.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return 2.0 * M * N * K * ITERS / best / 1e12

    fused_tflops = measure(fused_step)
    xla_tflops = measure(xla_step)

    print(json.dumps({
        "metric": "fused_fp8_quant_matmul_tflops",
        "value": round(fused_tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(fused_tflops / xla_tflops, 4),
    }))


if __name__ == "__main__":
    main()
