#!/usr/bin/env python
"""Sweep int4 fused-kernel tiles at DECODE shapes (M=8) on the TPU.

VERDICT r2 next #8: int4 decode measured 0.79x FP8-fast — the r2 tile
config (bm=256, bn=8192, bk2=256) was swept at prefill shapes only. Decode
matvecs are M=8: try M-padding to the int8 sublane tile (bm=32) and a
(bn, bk2) grid against the bf16 matmul and the FP8 packed kernel at the
same (8, K, N) shape. Interleaved slopes, JSON artifact.

Run AFTER the main bench queue (one TPU job at a time).
"""

import itertools
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _harness import emit_artifact, interleaved_slopes
from fp8_quantization_tpu.ops.fastpath import pack_int4
from fp8_quantization_tpu.ops.pallas.dequant_matmul import int4_matmul

M, K, N = 8, 4096, 14336  # decode matvec at Llama-ish mlp shapes


def main():
    rng = np.random.default_rng(10)
    codes = jnp.asarray(rng.integers(-8, 8, size=(K, N)), jnp.int8)
    w4 = pack_int4(codes)
    w16 = (codes.astype(jnp.float32) * 0.01).astype(jnp.bfloat16)
    x = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)
    x16 = x.astype(jnp.bfloat16)

    builders, args_for = {}, {}

    def bf16_chain(n):
        @jax.jit
        def f(x16, w16):
            def body(_, acc):
                o = jnp.dot(acc, w16, preferred_element_type=jnp.float32)
                return o[:, :K].astype(jnp.bfloat16) * 1e-3
            return lax.fori_loop(0, n, body, x16).sum()
        return f

    builders["bf16"] = bf16_chain
    args_for["bf16"] = (x16, w16)

    for bm, bn, bk2 in [(8, 8192, 256), (32, 8192, 256), (32, 14336, 512)]:
        name = f"i4_bm{bm}_bn{bn}_bk{bk2}"

        def build(n, bm=bm, bn=bn, bk2=bk2):
            @jax.jit
            def f(x, w4):
                def body(_, acc):
                    o = int4_matmul(acc, w4, k=K, bm=bm, bn=bn, bk2=bk2)
                    return (o[:, :K] & 0x7F).astype(jnp.int8)
                return lax.fori_loop(0, n, body, x).sum()
            return f

        builders[name] = build
        args_for[name] = (x, w4)

    results = interleaved_slopes(builders, args_for, depths=(8, 40),
                                 trials=5, max_n1=512)
    payload = {"metric": "int4_decode_tiles", "shape": [M, K, N]}
    base = results["bf16"]["per_iter"]
    for name, r in results.items():
        per = r["per_iter"]
        payload[name + "_us"] = round(per * 1e6, 1) if per else None
        if per and base and name != "bf16":
            payload[name + "_vs_bf16"] = round(base / per, 3)
        print(f"{name:22s}: {(per * 1e6 if per else float('nan')):9.1f} us",
              flush=True)
    emit_artifact("int4_decode_tiles", payload)


if __name__ == "__main__":
    main()
