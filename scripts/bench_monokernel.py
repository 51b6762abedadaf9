"""Pallas fused FP8 mono-kernel vs the XLA-fused fastpath, interleaved.

Measures the chained serving op (bf16 grid-exact input -> dot -> FP8
requant -> bf16 out) three ways at 4096^3:

  xla     — ops.fastpath.quantized_matmul (XLA fuses the requant epilogue)
  pallas  — ops.pallas.fused_matmul.fused_quant_matmul (hand kernel)
  sdpa    — the retargeted fused attention kernel at ViT-B/16 shapes,
            vs its unfused einsum+softmax+einsum reference (the shape XLA
            canNOT fuse — VERDICT r1 #2 retarget evidence)

Interleaved trials, median-of-ratios (see bench.py).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fp8_quantization_tpu.ops.fastpath import ScalarQuantParams, quantized_matmul
from fp8_quantization_tpu.ops.pallas.attention import fused_sdpa
from fp8_quantization_tpu.ops.pallas.fused_matmul import fused_quant_matmul

M = N = K = 4096
DEPTHS = (4, 20)
TRIALS = 5


def interleaved(builders, args_for, depths=DEPTHS):
    cells = {}
    for name, build in builders.items():
        for n in depths:
            f = build(n)
            float(f(*args_for[name]))
            cells[(name, n)] = f
    trials = {name: [] for name in builders}
    n0, n1 = depths
    for _ in range(TRIALS):
        t_cell = {}
        for key, f in cells.items():
            t0 = time.perf_counter()
            float(f(*args_for[key[0]]))
            t_cell[key] = time.perf_counter() - t0
        for name in builders:
            trials[name].append(
                (t_cell[(name, n1)] - t_cell[(name, n0)]) / (n1 - n0))
    return {name: sorted(ts)[len(ts) // 2] for name, ts in trials.items()}


def main():
    rng = np.random.default_rng(10)
    w16 = (jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
           * 0.015625).astype(jnp.bfloat16)
    x16 = jnp.asarray(rng.normal(size=(M, K)), jnp.float32).astype(
        jnp.bfloat16)
    res = ScalarQuantParams(maxval=jnp.float32(64.0), bias=jnp.int32(2),
                            mant=jnp.int32(4), sign=jnp.int32(1))
    res_t = (res.maxval, res.bias, res.mant, res.sign)

    def xla(n):
        @jax.jit
        def f(x16, w16):
            def body(_, acc):
                return quantized_matmul(acc, w16, act=None, res=res,
                                        out_dtype=jnp.bfloat16)
            return lax.fori_loop(0, n, body, x16).sum()
        return f

    def pallas(n):
        @jax.jit
        def f(x16, w16):
            def body(_, acc):
                return fused_quant_matmul(
                    acc, w16, act_params=None, res_params=res_t,
                    quantize_x=False, requantize_out=True,
                    out_dtype=jnp.bfloat16)
            return lax.fori_loop(0, n, body, x16).sum()
        return f

    flops = 2.0 * M * N * K
    t = interleaved({"xla": xla, "pallas": pallas},
                    {"xla": (x16, w16), "pallas": (x16, w16)})
    out = {
        "metric": "monokernel_vs_xla",
        "xla_tflops": round(flops / t["xla"] / 1e12, 2),
        "pallas_tflops": round(flops / t["pallas"] / 1e12, 2),
        "pallas_vs_xla": round(t["xla"] / t["pallas"], 4),
    }

    # --- the retarget: fused SDPA vs unfused at ViT-B/16 batch-32 shape.
    # Both sides start from the model's TOKEN-MAJOR activations
    # (B, T, H*D) so the comparison includes each side's real relayout
    # costs (the einsum fuses its transposes; the kernel needs none).
    b, h, s, d = 32, 12, 197, 64
    q = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32).astype(
        jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32).astype(
        jnp.bfloat16)

    def unfused_ref(qt, kt, vt):
        split = lambda u: u.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        qh, kh, vh = split(qt), split(kt), split(vt)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(d, jnp.float32))
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(jnp.bfloat16), vh,
                       preferred_element_type=jnp.float32)
        return o.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    def fused(qt, kt, vt):
        tok = lambda u: u.reshape(b, s, h, d)
        o = fused_sdpa(tok(qt), tok(kt), tok(vt), s_valid=s)
        return o.reshape(b, s, h * d)

    def chain_of(fn):
        def build(n):
            @jax.jit
            def f(q, k, v):
                def body(_, acc):
                    o = fn(q + acc.astype(jnp.bfloat16) * 0, k, v)
                    # depend on EVERY output element — a single-element
                    # dependency lets XLA narrow the whole einsum chain to
                    # one row (measured 12x phantom speedup), while the
                    # opaque pallas_call computes everything
                    return acc + jnp.sum(o.astype(jnp.float32))
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            return f
        return build

    sdpa_fused = chain_of(fused)
    sdpa_unfused = chain_of(unfused_ref)

    t2 = interleaved({"fused": sdpa_fused, "unfused": sdpa_unfused},
                     {"fused": (q, k, v), "unfused": (q, k, v)},
                     depths=(4, 16))
    out.update({
        "sdpa_fused_ms": round(t2["fused"] * 1e3, 3),
        "sdpa_unfused_ms": round(t2["unfused"] * 1e3, 3),
        "sdpa_speedup": round(t2["unfused"] / t2["fused"], 3),
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
