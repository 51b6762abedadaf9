"""Serving benchmark: quantized-Llama prefill and decode throughput on TPU.

Measures the FP8-quantized decoder (bf16 fast mode, frozen-weight cache,
FP8 KV cache) on the real chip:

* prefill: B=1, T tokens in one forward (tok/s);
* decode: B slots, one token per step over a fixed S-slot dense cache
  (tok/s = B * steps / time).

Timing uses fori_loop chains ending in a scalar readback with the slope
between two depths (per-dispatch timings are unreliable over the tunneled
device — see bench.py). Prefill iterations vary the tokens with the loop
index so XLA cannot hoist the loop-invariant forward.

Run: python scripts/bench_llama.py [--layers 8 --hidden 2048 ...]
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

from fp8_quantization_tpu.config import (
    EstimatorConfig, FP8Config, QMethod, QuantConfig, RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.sites import QuantPhase

REPEATS = 5


def slope(f, *args, depths=(2, 6)):
    """Per-iteration time from the slope between two fori_loop depths.

    The chain must be deep enough that the differential compute dominates
    the ~29 ms per-call tunnel overhead and its variance — shallow (2, 6)
    decode chains measured NEGATIVE slopes on 8-layer models (pure noise).
    Decode uses (8, 64); prefill (2, 8)."""
    ts = {}
    for n in depths:
        g = jax.jit(lambda *a, n=n: f(n, *a))
        float(g(*args))
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    n0, n1 = depths
    return (ts[n1] - ts[n0]) / (n1 - n0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--mlp", type=int, default=5632)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--prefill-t", type=int, default=1024)
    ap.add_argument("--decode-batch", type=int, default=8)
    ap.add_argument("--decode-s", type=int, default=1024)
    ap.add_argument("--packed", action="store_true",
                    help="1-byte packed weight storage + fused dequant "
                         "matmul (ops/pallas/dequant_matmul.py)")
    ap.add_argument("--packed-kv", action="store_true",
                    help="uint8 packed-code KV cache (half the footprint)")
    ap.add_argument("--quant", choices=["fp8", "int8", "int4"],
                    default="fp8",
                    help="weight/act quantizer family (int8/int4 use the "
                         "uniform quantizers; with --packed they run the "
                         "native int8 MXU / fused int4 kernel)")
    ap.add_argument("--no-fused", action="store_true",
                    help="disable the fused Pallas SDPA prefill branch (A/B)")
    ap.add_argument("--chained", action="store_true",
                    help="chained int8 serving: dense layers pass int8 codes "
                         "(+scale) between each other (needs --quant int8 "
                         "--packed; enables the res quantizer so layer "
                         "outputs live on a frozen per-tensor grid)")
    args = ap.parse_args()

    if args.chained and (args.quant != "int8" or not args.packed):
        raise SystemExit("--chained needs --quant int8 --packed")

    if args.no_fused:
        from fp8_quantization_tpu.ops.pallas import attention
        attention.DISABLE_FUSED = True

    spec = LlamaSpec(
        vocab_size=args.vocab, hidden_size=args.hidden,
        num_layers=args.layers, num_heads=args.heads,
        num_kv_heads=args.kv_heads, mlp_dim=args.mlp,
        max_seq_len=max(args.prefill_t, args.decode_s) + 64,
    )
    if args.quant == "fp8":
        qc = QuantConfig(
            method=QMethod.fp_quantizer,
            per_channel_weights=True,
            quantize_input=True,
            weight_range=EstimatorConfig(RangeMethod.current_minmax),
            act_range=EstimatorConfig(RangeMethod.allminmax),
            fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
            run_method=RunMethodConfig(res_quantizer_flag=True,
                                       original_quantize_res=True),
        )
    else:
        if args.packed_kv:
            raise SystemExit("--packed-kv needs the FP quantizer (--quant fp8)")
        qc = QuantConfig(
            method=QMethod.symmetric_uniform,
            n_bits=8 if args.quant == "int8" else 4,
            per_channel_weights=True,
            quantize_input=True,
            weight_range=EstimatorConfig(RangeMethod.current_minmax),
            act_range=EstimatorConfig(RangeMethod.allminmax),
            # chained: layer outputs requantize onto frozen per-tensor grids
            # (the codes ARE the inter-layer currency)
            run_method=RunMethodConfig(res_quantizer_flag=args.chained),
        )
    model = QuantizedLlama(qc=qc, spec=spec, packed_kv=args.packed_kv)
    kv_dtype = jnp.uint8 if args.packed_kv else jnp.bfloat16

    rng = np.random.default_rng(10)
    calib = jnp.asarray(rng.integers(0, spec.vocab_size, size=(2, 16)),
                        jnp.int32)
    cache0 = KVCache.zeros(spec, 2, 64, dtype=kv_dtype)
    print("init...", file=sys.stderr, flush=True)
    variables = model.init(jax.random.key(0), calib, cache0, ESTIMATE)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params/1e6:.0f}M", file=sys.stderr, flush=True)

    print("calibrate...", file=sys.stderr, flush=True)
    _, ups = model.apply(variables, calib, cache0, ESTIMATE,
                         mutable=["quant", "quant_est"])
    variables = {**variables, **ups}

    # freeze the quantized weights once (fast serving mode)
    warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
    fast = QuantPhase(phase="fixed", fast=True)
    print("freeze weights...", file=sys.stderr, flush=True)
    _, ups = model.apply(variables, calib, cache0, warm,
                         mutable=["quant_cache"])
    variables = {**variables, **ups}

    if args.packed:
        # real-8-bit weight storage: 1-byte codes + fused dequant matmul
        from fp8_quantization_tpu.ops.fastpath import (
            pack_dense_caches, strip_packed_params)

        variables, report = pack_dense_caches(variables, qc)
        variables = strip_packed_params(variables)
        fast = QuantPhase(phase="fixed", fast=True, packed=True,
                          chained=args.chained)
        exact = sum(report.values()) / max(len(report), 1)
        w_bytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves(variables)
        )
        print(f"packed {len(report)} dense layers "
              f"(mean exact channel fraction {exact:.3f}); resident "
              f"variables {w_bytes/1e6:.0f} MB", file=sys.stderr, flush=True)

    # --- prefill ---
    t_len = args.prefill_t
    base = jnp.asarray(rng.integers(0, spec.vocab_size, size=(1, t_len)),
                       jnp.int32)

    def prefill_chain(n, variables, base):
        def body(i, acc):
            # fresh cache per iteration (inside the body, so the buffer is
            # dead after the forward and the KV writes stay in place)
            cache = KVCache.zeros(spec, 1, t_len, dtype=kv_dtype)
            toks = (base + i) % spec.vocab_size
            logits, _ = model.apply(variables, toks, cache, fast)
            return acc + logits[0, -1].sum()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    print("prefill bench (first compile is slow)...", file=sys.stderr,
          flush=True)
    t_pre = slope(prefill_chain, variables, base, depths=(2, 8))
    pre_tps = t_len / t_pre

    # --- decode ---
    b, s_len = args.decode_batch, args.decode_s
    cache = KVCache.zeros(spec, b, s_len, dtype=kv_dtype)
    cache = KVCache(k=cache.k, v=cache.v,
                    length=jnp.full((b,), s_len // 2, jnp.int32))
    tok0 = jnp.asarray(rng.integers(0, spec.vocab_size, size=(b, 1)),
                       jnp.int32)

    def decode_chain(n, variables, tok0, cache):
        def body(i, carry):
            toks, cache, acc = carry
            logits, cache = model.apply(variables, toks, cache, fast)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1)[:, None].astype(
                jnp.int32)
            return (nxt, cache, acc + logits[:, -1].sum())

        _, _, acc = lax.fori_loop(0, n, body, (tok0, cache, jnp.float32(0.0)))
        return acc

    print("decode bench...", file=sys.stderr, flush=True)
    t_dec = slope(decode_chain, variables, tok0, cache, depths=(8, 64))
    dec_tps = b / t_dec

    print(json.dumps({
        "metric": "llama_serving",
        "params_m": round(n_params / 1e6, 1),
        "prefill_tok_s": round(pre_tps, 1),
        "prefill_ms": round(t_pre * 1e3, 2),
        "decode_tok_s": round(dec_tps, 1),
        "decode_step_ms": round(t_dec * 1e3, 3),
        "decode_batch": b,
        "decode_context": s_len,
        "packed_weights": bool(args.packed),
        "packed_kv": bool(args.packed_kv),
        "quant": args.quant,
        "chained": args.chained,
    }))


if __name__ == "__main__":
    main()
