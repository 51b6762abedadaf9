#!/usr/bin/env python
"""Batched speculative decoding: measured component costs + modeled payoff.

VERDICT r4 next #3 asked for a measured batched-speculative decode row.
Over the tunneled chip a host-stepped batcher loop is dispatch-bound
(~29 ms/call vs ~1.2-1.7 ms of device work), so this bench measures the
three DEVICE-side components of a speculative round as honest slope chains
(scripts/_harness.py) at the standard 509M serving shapes:

  step1      one-token batched decode step        (the non-speculative unit)
  verify     one (B, k+1)-token target forward    (the verify cost)
  draft      k+1 chained one-token draft decodes  (the propose cost)

and derives the standard speculative-decoding payoff model from them:
tokens/round = 1 + k*alpha for acceptance rate alpha (greedy longest-prefix
expectation, lower bound), so

  speedup(alpha) = (1 + k*alpha) * t_step1 / (t_draft + t_verify)

The artifact records the measured times, the modeled speedup at alpha in
{0, 0.5, 0.8, 1}, and the break-even acceptance. Token-level correctness
(spec == non-spec greedy, per slot, on-chip) is pinned separately by
tests/test_spec_batcher.py and the r5 drive script.

Run: python scripts/bench_spec_decode.py [--k 4] [--draft-scale 4]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _harness import emit_artifact, interleaved_slopes
from fp8_quantization_tpu.config import (
    EstimatorConfig, FP8Config, QMethod, QuantConfig, RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama
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
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--draft-scale", type=int, default=4,
                    help="draft = target dims / this factor")
    ap.add_argument("--decode-batch", type=int, default=8)
    ap.add_argument("--decode-s", type=int, default=1024)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--artifact", type=str, default="spec_decode")
    args = ap.parse_args(argv)

    ds = args.draft_scale
    spec = LlamaSpec(vocab_size=args.vocab, hidden_size=args.hidden,
                     num_layers=args.layers, num_heads=args.heads,
                     num_kv_heads=args.kv_heads, mlp_dim=args.mlp,
                     max_seq_len=args.decode_s + 64)
    dspec = LlamaSpec(vocab_size=args.vocab, hidden_size=args.hidden // ds,
                      num_layers=max(args.layers // 2, 1),
                      num_heads=max(args.heads // ds, 1),
                      num_kv_heads=max(args.kv_heads // ds, 1),
                      mlp_dim=args.mlp // ds,
                      max_seq_len=args.decode_s + 64)
    rng = np.random.default_rng(10)
    calib = jnp.asarray(rng.integers(0, spec.vocab_size, size=(2, 16)),
                        jnp.int32)
    fastp = QuantPhase(phase="fixed", fast=True)

    def calibrate(model, sp):
        cache0 = KVCache.zeros(sp, 2, 64)
        v = model.init(jax.random.key(0), calib, cache0, ESTIMATE)
        _, ups = model.apply(v, calib, cache0, ESTIMATE,
                             mutable=["quant", "quant_est"])
        v = {**v, **ups}
        warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
        _, ups = model.apply(v, calib, cache0, warm, mutable=["quant_cache"])
        return {**v, **ups}

    print("calibrating target + draft...", file=sys.stderr, flush=True)
    model = QuantizedLlama(qc=qc(), spec=spec)
    tvars = calibrate(model, spec)
    dmodel = QuantizedLlama(qc=qc(), spec=dspec)
    dvars = calibrate(dmodel, dspec)

    b, s_len, k = args.decode_batch, args.decode_s, args.k
    tok1 = jnp.asarray(rng.integers(0, spec.vocab_size, size=(b, 1)),
                       jnp.int32)
    tokk = jnp.asarray(rng.integers(0, spec.vocab_size, size=(b, k + 1)),
                       jnp.int32)
    L0 = jnp.full((b,), s_len // 2, jnp.int32)

    def fixed_len_chain(m, toks, sp):
        """Chain of applies at a FIXED cache frontier (length reset per
        iteration so every step costs the steady state — the plain decode
        builders let length advance, which overruns the slab at deep
        chains)."""
        cache0 = KVCache.zeros(sp, b, s_len)
        cache0 = cache0._replace(length=L0)

        def build(n):
            @jax.jit
            def f(variables, toks, cache):
                def body(i, carry):
                    cache, acc = carry
                    logits, cache = m.apply(variables, toks, cache, fastp)
                    cache = cache._replace(length=L0)
                    return (cache, acc + logits[:, -1].sum())
                _, acc = lax.fori_loop(0, n, body, (cache, jnp.float32(0.0)))
                return acc
            return f
        return build, cache0

    def draft_round_chain():
        """k+1 chained one-token draft decodes (the propose scan)."""
        cache0 = KVCache.zeros(dspec, b, s_len)
        cache0 = cache0._replace(length=L0)

        def build(n):
            @jax.jit
            def f(variables, tok, cache):
                def round_(i, carry):
                    cache, t, acc = carry

                    def step(c, _):
                        cc, tt = c
                        logits, cc = dmodel.apply(variables, tt, cc, fastp)
                        nxt = jnp.argmax(logits[:, -1, :],
                                         axis=-1)[:, None].astype(jnp.int32)
                        return (cc, nxt), logits[:, -1].sum()
                    (cache, t), outs = lax.scan(step, (cache, t), None,
                                                length=k + 1)
                    cache = cache._replace(length=L0)
                    return (cache, t, acc + outs.sum())
                _, _, acc = lax.fori_loop(0, n, round_,
                                          (cache, tok, jnp.float32(0.0)))
                return acc
            return f
        return build, cache0

    b1, c1 = fixed_len_chain(model, tok1, spec)
    bv, cv = fixed_len_chain(model, tokk, spec)
    bd, cd = draft_round_chain()

    builders = {"step1": b1, "verify": bv, "draft": bd}
    args_for = {"step1": (tvars, tok1, c1), "verify": (tvars, tokk, cv),
                "draft": (dvars, tok1, cd)}
    print("measuring...", file=sys.stderr, flush=True)
    results = interleaved_slopes(builders, args_for, depths=(2, 8),
                                 trials=args.trials, max_n1=256)

    payload = {"metric": "spec_decode_components", "k": k,
               "decode_batch": b, "decode_context": s_len,
               "target_params_m": round(sum(
                   x.size for x in jax.tree.leaves(tvars["params"])) / 1e6),
               "draft_params_m": round(sum(
                   x.size for x in jax.tree.leaves(dvars["params"])) / 1e6),
               "components": {}}
    per = {}
    for name, r in results.items():
        per[name] = r["per_iter"]
        payload["components"][name] = {
            "ms": round(r["per_iter"] * 1e3, 3) if r["per_iter"] else None,
            "floor_ok": r["floor_ok"],
        }
        print(f"{name:8s}: "
              f"{(r['per_iter'] * 1e3 if r['per_iter'] else float('nan')):8.3f}"
              f" ms", flush=True)

    if all(per.get(n) for n in ("step1", "verify", "draft")):
        t1, tv, td = per["step1"], per["verify"], per["draft"]
        round_ms = (td + tv) * 1e3
        payload["round_ms"] = round(round_ms, 3)
        payload["modeled_speedup_vs_alpha"] = {
            str(a): round((1 + k * a) * t1 / (td + tv), 3)
            for a in (0.0, 0.5, 0.8, 1.0)
        }
        # speedup(alpha) = 1  =>  alpha* = ((td+tv)/t1 - 1) / k
        payload["break_even_acceptance"] = round(
            ((td + tv) / t1 - 1) / k, 3)
        for kk, vv in payload["modeled_speedup_vs_alpha"].items():
            print(f"speedup @ alpha={kk}: {vv}x", flush=True)
        print(f"break-even acceptance: {payload['break_even_acceptance']}",
              flush=True)

    emit_artifact(args.artifact, payload)


if __name__ == "__main__":
    main(sys.argv[1:])
