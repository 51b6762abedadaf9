#!/usr/bin/env python
"""What the paged KV cache costs per decode step vs the dense slab.

The PagedBatcher's device step replaces the dense cache's contiguous
dynamic_update_slice writes + direct slab reads with a page scatter
(``pool.at[pp, off].set``) and a page-table gather (``pool[page_table]``)
per layer. This bench prices that exchange honestly at the standard 509M
serving shapes (B=8, ctx 1024, bf16-fast mode) with the harness's
interleaved slope chains:

  dense            dense-slab decode step (the ContinuousBatcher unit)
  paged            paged decode step, contiguous page table
  paged_scrambled  same, physically scrambled page table (the steady state
                   of a long-running pool after many admit/retire cycles)

The scrambled mode pins that the gather cost is layout-insensitive (XLA
gathers by index either way); if it measurably differs, page-pool
fragmentation would be a real serving concern.

Token-level equality of the two batchers is pinned by
tests/test_paged_kv.py; this artifact is the speed half of the story
(docs/SERVING.md cites it for the paged row).

Run: python scripts/bench_paged.py [--page-size 64]
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
from fp8_quantization_tpu.config import (
    EstimatorConfig, FP8Config, QMethod, QuantConfig, RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama
from fp8_quantization_tpu.models.paged_kv import PagedKVCache
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.sites import QuantPhase


def qc():
    return QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--mlp", type=int, default=5632)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--decode-batch", type=int, default=8)
    ap.add_argument("--decode-s", type=int, default=1024)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--artifact", type=str, default="paged_decode")
    args = ap.parse_args(argv)

    spec = LlamaSpec(vocab_size=args.vocab, hidden_size=args.hidden,
                     num_layers=args.layers, num_heads=args.heads,
                     num_kv_heads=args.kv_heads, mlp_dim=args.mlp,
                     max_seq_len=args.decode_s)
    rng = np.random.default_rng(10)
    calib = jnp.asarray(rng.integers(0, spec.vocab_size, size=(2, 16)),
                        jnp.int32)
    fastp = QuantPhase(phase="fixed", fast=True)

    print("calibrating...", file=sys.stderr, flush=True)
    model = QuantizedLlama(qc=qc(), spec=spec)
    cache0 = KVCache.zeros(spec, 2, 64)
    v = model.init(jax.random.key(0), calib, cache0, ESTIMATE)
    _, ups = model.apply(v, calib, cache0, ESTIMATE,
                         mutable=["quant", "quant_est"])
    v = {**v, **ups}
    warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
    _, ups = model.apply(v, calib, cache0, warm, mutable=["quant_cache"])
    variables = {**v, **ups}

    b, s_len, page = args.decode_batch, args.decode_s, args.page_size
    tok1 = jnp.asarray(rng.integers(0, spec.vocab_size, size=(b, 1)),
                       jnp.int32)
    L0 = jnp.full((b,), s_len // 2, jnp.int32)
    max_pages = -(-s_len // page)
    num_pages = b * max_pages + 1

    def dense_chain():
        cache0 = KVCache.zeros(spec, b, s_len)._replace(length=L0)

        def build(n):
            @jax.jit
            def f(variables, toks, cache):
                def body(i, carry):
                    cache, acc = carry
                    logits, cache = model.apply(variables, toks, cache, fastp)
                    # reset the frontier: every iteration costs the steady
                    # state instead of overrunning the slab at deep chains
                    cache = cache._replace(length=L0)
                    return (cache, acc + logits[:, -1].sum())
                _, acc = lax.fori_loop(0, n, body, (cache0._replace(
                    k=cache.k, v=cache.v), jnp.float32(0.0)))
                return acc
            return f
        return build, cache0

    def paged_chain(scrambled: bool):
        table = np.zeros((b, max_pages), np.int32)
        phys = np.arange(1, num_pages)
        if scrambled:
            np.random.default_rng(3).shuffle(phys)
        table[:] = phys.reshape(b, max_pages)
        cache0 = PagedKVCache.zeros(spec, b, num_pages, page, max_pages)
        cache0 = cache0._replace(page_table=jnp.asarray(table), length=L0)

        def build(n):
            @jax.jit
            def f(variables, toks, cache):
                def body(i, carry):
                    cache, acc = carry
                    logits, cache = model.apply(variables, toks, cache, fastp)
                    cache = cache._replace(length=L0)
                    return (cache, acc + logits[:, -1].sum())
                _, acc = lax.fori_loop(0, n, body, (cache0._replace(
                    k_pages=cache.k_pages, v_pages=cache.v_pages),
                    jnp.float32(0.0)))
                return acc
            return f
        return build, cache0

    bd, cd = dense_chain()
    bp, cp = paged_chain(False)
    bs, cs = paged_chain(True)
    builders = {"dense": bd, "paged": bp, "paged_scrambled": bs}
    args_for = {"dense": (variables, tok1, cd),
                "paged": (variables, tok1, cp),
                "paged_scrambled": (variables, tok1, cs)}
    print("measuring...", file=sys.stderr, flush=True)
    results = interleaved_slopes(builders, args_for, depths=(2, 8),
                                 trials=args.trials, max_n1=256)

    payload = {"metric": "paged_decode_step", "decode_batch": b,
               "decode_context": s_len, "page_size": page,
               "num_pages": num_pages,
               "params_m": round(sum(
                   x.size for x in jax.tree.leaves(
                       variables["params"])) / 1e6),
               "modes": {}}
    for name, r in results.items():
        payload["modes"][name] = {
            "ms": round(r["per_iter"] * 1e3, 3) if r["per_iter"] else None,
            "floor_ok": r["floor_ok"],
        }
        print(f"{name:16s}: "
              f"{(r['per_iter'] * 1e3 if r['per_iter'] else float('nan')):8.3f}"
              f" ms", flush=True)
    for num, den, label in [("dense", "paged", "paged_vs_dense"),
                            ("paged", "paged_scrambled",
                             "scrambled_vs_contiguous")]:
        med, spread = ratio(results, num, den)
        if med is not None:
            payload[label] = round(med, 4)
            payload[label + "_spread"] = [round(spread[0], 4),
                                          round(spread[1], 4)]
            print(f"{label}: {med:.3f}x", flush=True)
    emit_artifact(args.artifact, payload)


if __name__ == "__main__":
    main(sys.argv[1:])
