"""Dump the optimized HLO of the int8-packed Llama decode step and count
suspect ops (f32 converts of weight-sized arrays, transposes, non-s8 dots).

Run: python scripts/probe_int8_hlo.py [--layers 2]
"""

import argparse
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.config import (
    EstimatorConfig, QMethod, QuantConfig, RangeMethod, RunMethodConfig,
)
from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.sites import QuantPhase


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--quant", default="int8", choices=["int8", "fp8"])
    args = ap.parse_args()

    spec = LlamaSpec(vocab_size=32000, hidden_size=2048,
                     num_layers=args.layers, num_heads=16, num_kv_heads=8,
                     mlp_dim=5632, max_seq_len=1024 + 64)
    if args.quant == "int8":
        qc = QuantConfig(
            method=QMethod.symmetric_uniform, n_bits=8,
            per_channel_weights=True, quantize_input=True,
            weight_range=EstimatorConfig(RangeMethod.current_minmax),
            act_range=EstimatorConfig(RangeMethod.allminmax),
            run_method=RunMethodConfig(),
        )
    else:
        from fp8_quantization_tpu.config import FP8Config
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
    variables = model.init(jax.random.key(0), calib, cache0, ESTIMATE)
    _, ups = model.apply(variables, calib, cache0, ESTIMATE,
                         mutable=["quant", "quant_est"])
    variables = {**variables, **ups}
    warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
    fast = QuantPhase(phase="fixed", fast=True, packed=True)
    _, ups = model.apply(variables, calib, cache0, warm,
                         mutable=["quant_cache"])
    variables = {**variables, **ups}
    if args.quant == "int8":
        from fp8_quantization_tpu.ops.fastpath import (
            pack_dense_caches, strip_packed_params)
        variables, report = pack_dense_caches(variables, qc)
        variables = strip_packed_params(variables)
        print(f"packed {len(report)} layers", file=sys.stderr)
    else:
        fast = QuantPhase(phase="fixed", fast=True)

    b = 8
    cache = KVCache.zeros(spec, b, 1024)
    cache = KVCache(k=cache.k, v=cache.v,
                    length=jnp.full((b,), 512, jnp.int32))
    tok = jnp.zeros((b, 1), jnp.int32)

    def step(variables, tok, cache):
        logits, cache = model.apply(variables, tok, cache, fast)
        return logits, cache

    lowered = jax.jit(step).lower(variables, tok, cache)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(f"/tmp/hlo_full_{args.quant}.txt", "w") as fh:
        fh.write(txt)
    print(f"total HLO lines: {len(txt.splitlines())}", file=sys.stderr)

    dots = [ln.strip() for ln in txt.splitlines()
            if ("dot(" in ln or " convolution(" in ln)]
    print("== dots/convolutions ==")
    for d in dots:
        print(re.sub(r"metadata=\{.*?\}", "", d)[:300])
    print("== transposes of big arrays ==")
    for ln in txt.splitlines():
        if "transpose(" in ln and ("2048" in ln or "5632" in ln
                                   or "32000" in ln):
            print(re.sub(r"metadata=\{.*?\}", "", ln.strip())[:300])
    print("== converts of weight-sized arrays ==")
    for ln in txt.splitlines():
        m = re.search(r"= (\S+)\[?.*convert", ln)
        if "convert(" in ln and ("5632,2048" in ln or "2048,5632" in ln
                                 or "2048,32000" in ln or "2048,2048" in ln):
            print(re.sub(r"metadata=\{.*?\}", "", ln.strip())[:300])


if __name__ == "__main__":
    main()
