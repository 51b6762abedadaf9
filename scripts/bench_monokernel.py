"""Pallas fused FP8 mono-kernel vs the XLA-fused fastpath, interleaved.

Measures the chained serving op (bf16 grid-exact input -> dot -> FP8
requant -> bf16 out) and the fused-SDPA retarget at ViT-B/16 shapes:

  xla     — ops.fastpath.quantized_matmul (XLA fuses the requant epilogue)
  pallas  — ops.pallas.fused_matmul.fused_quant_matmul (hand kernel)
  sdpa    — fused attention kernel vs its unfused einsum+softmax+einsum
            reference (the shape XLA canNOT fuse)

Interleaved trials with auto-deepened slope chains (scripts/_harness.py) —
the r2 committed depths (4, 20) measured a NEGATIVE unfused-SDPA slope
because 16 x ~0.4 ms differential compute sat under the tunnel's noise
floor (VERDICT r2 weak #3); the harness now enforces the >=50 ms rule.
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _harness import emit_artifact, interleaved_slopes, ratio
from fp8_quantization_tpu.ops.fastpath import ScalarQuantParams, quantized_matmul
from fp8_quantization_tpu.ops.pallas.attention import fused_sdpa
from fp8_quantization_tpu.ops.pallas.fused_matmul import fused_quant_matmul

M = N = K = 4096
TRIALS = 5


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
    t = interleaved_slopes({"xla": xla, "pallas": pallas},
                           {"xla": (x16, w16), "pallas": (x16, w16)},
                           depths=(4, 20), trials=TRIALS, max_n1=128)
    med, spread = ratio(t, "xla", "pallas")
    out = {
        "metric": "monokernel_vs_xla",
        "xla_tflops": (round(flops / t["xla"]["per_iter"] / 1e12, 2)
                       if t["xla"]["floor_ok"] else None),
        "pallas_tflops": (round(flops / t["pallas"]["per_iter"] / 1e12, 2)
                          if t["pallas"]["floor_ok"] else None),
        "pallas_vs_xla": round(med, 4) if med else None,
        "pallas_vs_xla_spread": ([round(spread[0], 4), round(spread[1], 4)]
                                 if spread else None),
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
                    # REAL loop-carried dependency: scale q by (1 + eps(acc))
                    # — `q + acc*0` folds to a loop-INVARIANT operand and XLA
                    # hoists the whole unfused einsum chain out of the loop
                    # (r3 measured a phantom 0.067 ms/iter slope, caught by
                    # the harness floor check). The perturbation is below
                    # bf16 resolution, so values are unchanged.
                    qi = (q.astype(jnp.float32)
                          * (1.0 + acc * 1e-30)).astype(jnp.bfloat16)
                    o = fn(qi, k, v)
                    # depend on EVERY output element — a single-element
                    # dependency lets XLA narrow the whole einsum chain to
                    # one row (measured 12x phantom speedup), while the
                    # opaque pallas_call computes everything
                    return acc + jnp.sum(o.astype(jnp.float32))
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            return f
        return build

    t2 = interleaved_slopes(
        {"fused": chain_of(fused), "unfused": chain_of(unfused_ref)},
        {"fused": (q, k, v), "unfused": (q, k, v)},
        depths=(8, 40), trials=TRIALS, max_n1=2048)
    med2, spread2 = ratio(t2, "unfused", "fused")
    out.update({
        "sdpa_fused_ms": (round(t2["fused"]["per_iter"] * 1e3, 3)
                          if t2["fused"]["floor_ok"] else None),
        "sdpa_unfused_ms": (round(t2["unfused"]["per_iter"] * 1e3, 3)
                            if t2["unfused"]["floor_ok"] else None),
        "sdpa_speedup": round(med2, 3) if med2 else None,
        "sdpa_speedup_spread": ([round(spread2[0], 4), round(spread2[1], 4)]
                                if spread2 else None),
    })
    emit_artifact("monokernel", out)


if __name__ == "__main__":
    main()
