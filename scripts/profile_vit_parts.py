#!/usr/bin/env python
"""Decompose ViT-B/16 fast/chained step time into component costs on TPU.

Times each component of one encoder block at the real batch-32 shapes
(M = 32*197 tokens), chained deep enough for trustworthy slopes, all
interleaved: the matmul stack (int8 and bf16), LayerNorm, GELU, the quant
sites (FP8 and int8 requant), the residual+site, and attention (fused vs
einsum). The sum of parts vs the measured E2E step time says what to fuse
next (VERDICT r2 next #1c).
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _harness import emit_artifact, interleaved_slopes

B, T, H, D, MLP = 32, 197, 12, 768, 3072
M = B * T


def chain(body, x0):
    def build(n):
        @jax.jit
        def f(*args):
            def step(_, acc):
                return body(acc, *args[1:])
            return lax.fori_loop(0, n, step, args[0]).sum()
        return f
    return build


def main():
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    x16 = x.astype(jnp.bfloat16)
    w16 = jnp.asarray(rng.normal(size=(D, D)) * 0.03, jnp.bfloat16)
    wmlp16 = jnp.asarray(rng.normal(size=(D, MLP)) * 0.03, jnp.bfloat16)
    wmlp16b = jnp.asarray(rng.normal(size=(MLP, D)) * 0.03, jnp.bfloat16)
    wi8 = (np.asarray(rng.normal(size=(D, D)) * 30)).astype(np.int8)
    wi8 = jnp.asarray(wi8)
    wsum = jnp.sum(wi8.astype(jnp.int32), axis=0)

    from fp8_quantization_tpu.ops.fastpath import (
        Int8Weights, ScalarQuantParams, quantize_acts_int8,
        quantized_matmul, quantized_matmul_int8)

    res = ScalarQuantParams(maxval=jnp.float32(64.0), bias=jnp.int32(2),
                            mant=jnp.int32(4), sign=jnp.int32(1))
    iw = Int8Weights(codes=wi8, scale=jnp.full((D,), 2.0 ** -10), zp=None,
                     wsum=wsum)
    sx = jnp.float32(2 ** -5)
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)

    # per-BLOCK matmul stacks (4x DxD + D->MLP->D)
    def block_mm_bf16(acc, w16, wmlp16, wmlp16b):
        h = acc
        for _ in range(4):
            h = quantized_matmul(h, w16, act=None, res=res,
                                 out_dtype=jnp.bfloat16)
        h = quantized_matmul(h, wmlp16, act=None, res=res,
                             out_dtype=jnp.bfloat16)
        h = quantized_matmul(h, wmlp16b, act=None, res=res,
                             out_dtype=jnp.bfloat16)
        return h

    def block_mm_int8(acc, iw):
        h = acc
        for _ in range(6):  # same op count, square shapes (cheap proxy)
            codes, cx = quantize_acts_int8(h, sx, 0.0, -128.0, 127.0)
            h = quantized_matmul_int8(codes, iw, sx, cx)
        return h

    def ln(acc, gamma, beta):
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.var(acc, axis=-1, keepdims=True)
        return (acc - mean) * lax.rsqrt(var + 1e-12) * gamma + beta

    def two_ln(acc, gamma, beta):
        return ln(ln(acc, gamma, beta), gamma, beta)

    def gelu(acc):
        return jax.nn.gelu(acc)

    from fp8_quantization_tpu.ops.pallas.fused_matmul import quantize_block

    def fp8_sites(acc):
        # 5 act/res fake-quant passes (one block's worth of site work)
        h = acc
        for _ in range(5):
            h = quantize_block(h, res.maxval, res.bias, res.mant, res.sign)
        return h

    def int8_sites(acc):
        h = acc
        for _ in range(5):
            codes, cx = quantize_acts_int8(h, sx, 0.0, -128.0, 127.0)
            h = sx * (codes.astype(jnp.float32) - cx)
        return h

    # attention at (B, T, H, Dh)
    q = jnp.asarray(rng.normal(size=(B, T, H * 64)), jnp.bfloat16)

    from fp8_quantization_tpu.ops.pallas.attention import fused_sdpa

    def attn_fused(acc):
        o = fused_sdpa(acc.reshape(B, T, H, 64), acc.reshape(B, T, H, 64),
                       acc.reshape(B, T, H, 64), s_valid=T)
        return o.reshape(B, T, H * 64).astype(jnp.bfloat16)

    def attn_einsum(acc):
        u = acc.reshape(B, T, H, 64).transpose(0, 2, 1, 3)
        sc = jnp.einsum("bhqd,bhkd->bhqk", u, u,
                        preferred_element_type=jnp.float32) / 8.0
        p = jax.nn.softmax(sc, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16), u,
                       preferred_element_type=jnp.float32)
        return o.transpose(0, 2, 1, 3).reshape(B, T, H * 64).astype(
            jnp.bfloat16)

    builders = {
        "block_mm_bf16": chain(block_mm_bf16, x16),
        "block_mm_int8": chain(block_mm_int8, x),
        "two_ln": chain(two_ln, x),
        "gelu": chain(gelu, x),
        "fp8_sites_x5": chain(fp8_sites, x),
        "int8_sites_x5": chain(int8_sites, x),
        "attn_fused": chain(attn_fused, q),
        "attn_einsum": chain(attn_einsum, q),
    }
    args_for = {
        "block_mm_bf16": (x16, w16, wmlp16, wmlp16b),
        "block_mm_int8": (x, iw),
        "two_ln": (x, gamma, beta),
        "gelu": (x,),
        "fp8_sites_x5": (x,),
        "int8_sites_x5": (x,),
        "attn_fused": (q,),
        "attn_einsum": (q,),
    }
    # max_n1 8192: the cheap cells (gelu, LN, int8 sites, einsum attention)
    # run ~10-30 us/iter, so clearing the 50 ms differential floor needs
    # chains thousands deep — fori_loop depth costs nothing at compile time
    # (VERDICT r4 weak #6: the r3 run capped at 512 and published
    # "indicative" sub-floor rows; this run must have floor_ok on ALL cells)
    results = interleaved_slopes(builders, args_for, depths=(8, 32),
                                 trials=5, max_n1=8192)
    payload = {"metric": "vit_parts_us_per_block", "batch": B}
    for name, r in results.items():
        per = r["per_iter"]
        payload[name + "_us"] = round(per * 1e6, 1) if per else None
        payload[name + "_floor_ok"] = r["floor_ok"]
        print(f"{name:16s}: {(per * 1e6 if per else float('nan')):9.1f} "
              f"us/iter (x12 = {(per * 12e3 if per else float('nan')):7.3f} "
              f"ms/model)", flush=True)
    emit_artifact("vit_parts", payload)


if __name__ == "__main__":
    main()
