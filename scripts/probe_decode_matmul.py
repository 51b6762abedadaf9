"""Probe: decode-shape (M=8) matmul strategies on the real chip.

Times one (M, K) @ (K, N) per step over a stack of L distinct weight
buffers (total >> VMEM so weights stream from HBM each step), comparing:

  bf16   — bf16 weights, bf16 dot, f32 accum (the fast-mode decode op)
  int8   — int8 codes, native int8 dot -> int32 (XLA picks the strategy)
  int8up — int8 codes upcast to bf16 IN the same fusion, bf16 dot
  f32    — f32 weights (reference-faithful floor)

Run: python scripts/probe_decode_matmul.py [--m 8 --k 2048 --n 5632 --l 64]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DEPTHS = (4, 12)


def slope(f, *args):
    ts = {}
    for n in DEPTHS:
        g = jax.jit(lambda *a, n=n: f(n, *a))
        float(g(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    n0, n1 = DEPTHS
    return (ts[n1] - ts[n0]) / (n1 - n0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--n", type=int, default=5632)
    ap.add_argument("--l", type=int, default=64)
    args = ap.parse_args()
    m, k, n, L = args.m, args.k, args.n, args.l

    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-127, 127, size=(L, k, n)), jnp.int8)
    w16 = w8.astype(jnp.bfloat16)
    w32 = w8.astype(jnp.float32)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    x8 = jnp.asarray(rng.integers(-127, 127, size=(m, k)), jnp.int8)

    gb_each = {"bf16": L * k * n * 2, "int8": L * k * n, "int8up": L * k * n, "int8full": L * k * n,
               "f32": L * k * n * 4}

    def chain_bf16(d, w16, x):
        xb = x.astype(jnp.bfloat16)

        def body(i, acc):
            out = jnp.dot(xb + acc.astype(jnp.bfloat16) * 0, w16[i % L],
                          preferred_element_type=jnp.float32)
            return acc + out[0, 0]
        return lax.fori_loop(0, d * L, body, jnp.float32(0.0))

    def chain_int8(d, w8, x8):
        def body(i, acc):
            xi = (x8 + acc.astype(jnp.int8) * 0)
            out = jnp.dot(xi, w8[i % L], preferred_element_type=jnp.int32)
            return acc + out[0, 0]
        return lax.fori_loop(0, d * L, body, jnp.int32(0))

    def chain_int8up(d, w8, x):
        xb = x.astype(jnp.bfloat16)

        def body(i, acc):
            wb = w8[i % L].astype(jnp.bfloat16)
            out = jnp.dot(xb + acc.astype(jnp.bfloat16) * 0, wb,
                          preferred_element_type=jnp.float32)
            return acc + out[0, 0]
        return lax.fori_loop(0, d * L, body, jnp.float32(0.0))

    def chain_f32(d, w32, x):
        def body(i, acc):
            out = jnp.dot(x + acc * 0, w32[i % L],
                          preferred_element_type=jnp.float32)
            return acc + out[0, 0]
        return lax.fori_loop(0, d * L, body, jnp.float32(0.0))

    # the model's full int8 layer: f32 x -> quantize codes -> int8 dot ->
    # dequant epilogue with zero-point corrections (fastpath.py)
    scale_w = jnp.ones((n,), jnp.float32) * 0.01
    wsum = jnp.sum(w8.astype(jnp.int32), axis=1)  # (L, N)

    def chain_int8full(d, w8, x):
        def body(i, acc):
            xi = x + acc * 0
            x_int = jnp.clip(jnp.round(xi / 0.05), -128, 127)
            codes = x_int.astype(jnp.int8)
            dot = jnp.dot(codes, w8[i % L], preferred_element_type=jnp.int32)
            out = dot.astype(jnp.float32) - 0.0 * wsum[i % L][None, :]
            xsum = jnp.sum(codes.astype(jnp.int32), axis=-1, keepdims=True)
            out = out - 0.0 * xsum.astype(jnp.float32)
            out = out * (0.05 * scale_w)[None, :]
            return acc + out[0, 0]
        return lax.fori_loop(0, d * L, body, jnp.float32(0.0))

    for name, f, fargs in [
        ("bf16", chain_bf16, (w16, x)),
        ("int8", chain_int8, (w8, x8)),
        ("int8up", chain_int8up, (w8, x)),
        ("int8full", chain_int8full, (w8, x)),
        ("f32", chain_f32, (w32, x)),
    ]:
        t = slope(f, *fargs) / L
        bw = gb_each[name] / L / t / 1e9
        print(f"{name:7s}: {t*1e6:9.2f} us/matmul  weight-BW {bw:7.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
