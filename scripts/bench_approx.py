#!/usr/bin/env python
"""Fused Pallas approx-multiplier matmul vs the jnp oracle, as an artifact.

README's "~600x faster than the XLA 3-D-materialization oracle" row
previously cited only `sweep_approx_tiles.py` (a printout); this bench
re-measures the pair with the shared harness (interleaved slope chains) and
emits `bench_artifacts/approx_matmul.json` so the claim traces to a
committed artifact (VERDICT r3 weak #7).

The oracle is the reference formulation (approx_matmul_whole_v9.py): the
(M, K, N) pairwise-product tensor materializes in HBM; the fused kernel
performs the same LUT arithmetic tilewise in VMEM. Bit-exactness is asserted
before timing.

Run: python scripts/bench_approx.py [--size 512]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _harness import emit_artifact, interleaved_slopes, ratio


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args(argv)

    from fp8_quantization_tpu.config import ApproxConfig
    from fp8_quantization_tpu.numerics.codec import quantize_exmy
    from fp8_quantization_tpu.ops.layers import approx_matmul_2d

    s = args.size
    rng = np.random.default_rng(0)
    a = quantize_exmy(jnp.asarray(rng.normal(size=(s, s)), jnp.float32), 3, 4, 4)
    b = quantize_exmy(jnp.asarray(rng.normal(size=(s, s)), jnp.float32), 3, 4, 4)
    bias_a = jnp.asarray(4, jnp.int32)
    bias_b = jnp.full((s,), 4, jnp.int32)
    bias_r = jnp.asarray(4, jnp.int32)
    approx = ApproxConfig(expo_width=3, mant_width=4, with_approx=True,
                          with_comp=True, dnsmp_factor=3)

    # NOTE: always pass operands as jit ARGUMENTS — nullary jits embed them
    # as constants and XLA's constant folder mis-evaluates the
    # interpret-mode pallas body (verified divergence; the same sharp edge
    # the verify skill flags for closed-over device arrays)
    def run(a0, b0, allow_pallas):
        return approx_matmul_2d(a0, b0, bias_a, bias_b, bias_r, approx,
                                allow_pallas=allow_pallas)

    print("bit-exactness check...", flush=True)
    y_kernel = np.asarray(jax.jit(lambda u, v: run(u, v, True))(a, b))
    y_oracle = np.asarray(jax.jit(lambda u, v: run(u, v, False))(a, b))
    np.testing.assert_array_equal(y_kernel, y_oracle)
    print("kernel == oracle bit-for-bit", flush=True)

    def builder(allow_pallas):
        def build(n):
            @jax.jit
            def f(a0, b0):
                def body(_, acc):
                    out = run(acc, b0, allow_pallas)
                    # requantize so the chain stays on the ExMy grid
                    return quantize_exmy(out * 1e-2, 3, 4, 4)
                return lax.fori_loop(0, n, body, a0).sum()
            return f
        return build

    results = interleaved_slopes(
        {"kernel": builder(True), "oracle": builder(False)},
        {"kernel": (a, b), "oracle": (a, b)},
        depths=(1, 3), trials=args.trials, max_n1=64)

    payload = {"metric": "approx_matmul_512", "size": s, "impls": {}}
    for name, r in results.items():
        per = r["per_iter"]
        payload["impls"][name] = {
            "ms_per_iter": round(per * 1e3, 3) if per else None,
            "floor_ok": r["floor_ok"], "depths": r["depths"],
        }
        print(f"{name:8s}: {(per * 1e3 if per else float('nan')):10.2f} ms",
              flush=True)
    med, spread = ratio(results, "oracle", "kernel")
    if med is not None:
        payload["kernel_speedup"] = round(med, 2)
        payload["kernel_speedup_spread"] = [round(spread[0], 2),
                                            round(spread[1], 2)]
        print(f"kernel speedup vs oracle: {med:.1f}x "
              f"(spread {spread[0]:.1f}-{spread[1]:.1f})", flush=True)
    emit_artifact("approx_matmul", payload)


if __name__ == "__main__":
    main(sys.argv[1:])
