"""Prefix-caching admission latency: cold prefill vs cached-prefix resume.

Measures ContinuousBatcher.admit() wall time for a long shared system
prompt: cold (full prefill) vs warm (copy cached prefix KV + prefill the
few remainder tokens). Uses repeated admits of retired slots so jit
compilation is excluded.

Run: python scripts/bench_prefix.py [--prompt-len 1024 --tail 16]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.config import (
    EstimatorConfig, FP8Config, QMethod, QuantConfig, RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama
from fp8_quantization_tpu.models.prefix_cache import PrefixCache
from fp8_quantization_tpu.models.serving import ContinuousBatcher
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.sites import QuantPhase


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--mlp", type=int, default=5632)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--prompt-len", type=int, default=1024)
    ap.add_argument("--tail", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    spec = LlamaSpec(vocab_size=args.vocab, hidden_size=args.hidden,
                     num_layers=args.layers, num_heads=args.heads,
                     num_kv_heads=args.kv_heads, mlp_dim=args.mlp,
                     max_seq_len=args.prompt_len + args.tail + 64)
    qc = QuantConfig(
        method=QMethod.fp_quantizer, per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )
    model = QuantizedLlama(qc=qc, spec=spec)
    rng = np.random.default_rng(10)
    calib = jnp.asarray(rng.integers(0, spec.vocab_size, size=(2, 16)),
                        jnp.int32)
    cache0 = KVCache.zeros(spec, 2, 64)
    print("init + calibrate + freeze...", file=sys.stderr, flush=True)
    variables = model.init(jax.random.key(0), calib, cache0, ESTIMATE)
    _, ups = model.apply(variables, calib, cache0, ESTIMATE,
                         mutable=["quant", "quant_est"])
    variables = {**variables, **ups}
    warm_qp = QuantPhase(phase="fixed", fast=True, cache_weights=True)
    _, ups = model.apply(variables, calib, cache0, warm_qp,
                         mutable=["quant_cache"])
    variables = {**variables, **ups}
    fast = QuantPhase(phase="fixed", fast=True)

    shared = rng.integers(0, spec.vocab_size, size=args.prompt_len).tolist()

    def time_admits(pc):
        b = ContinuousBatcher(model, variables, spec, slots=1,
                              max_seq=spec.max_seq_len, qp=fast,
                              prefix_cache=pc)
        # warm compiles (and the prefix store) with one admit/retire
        tail = rng.integers(0, spec.vocab_size, size=args.tail).tolist()
        b.retire(b.admit(shared + tail, max_new_tokens=1))
        best = float("inf")
        for i in range(args.repeats):
            tail = rng.integers(0, spec.vocab_size, size=args.tail).tolist()
            t0 = time.perf_counter()
            s = b.admit(shared + tail, max_new_tokens=1)
            jax.block_until_ready(b.cache.k)
            best = min(best, time.perf_counter() - t0)
            b.retire(s)
        return best

    print("cold admissions...", file=sys.stderr, flush=True)
    t_cold = time_admits(None)
    print("warm admissions...", file=sys.stderr, flush=True)
    t_warm = time_admits(PrefixCache(max_tokens=args.prompt_len * 2))

    print(json.dumps({
        "metric": "prefix_cache_admission",
        "prompt_len": args.prompt_len,
        "tail": args.tail,
        "cold_admit_ms": round(t_cold * 1e3, 2),
        "warm_admit_ms": round(t_warm * 1e3, 2),
        "speedup": round(t_cold / t_warm, 2),
    }))


if __name__ == "__main__":
    main()
