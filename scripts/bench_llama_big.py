#!/usr/bin/env python
"""CAPACITY-scale Llama serving: a model that does NOT fit bf16 on one v5e
but serves from packed-FP8 (1 B/weight) or int4 (0.5 B/weight) codes.

The round-5 flagship demonstration (VERDICT r4 next #1): every packed/int4
number so far was taken on a 509M toy whose bf16 weights trivially fit the
16 GiB HBM — quantifying the packed modes' COST but never their BENEFIT.
This bench builds a ~9B-parameter LlamaSpec whose bf16 resident set
(~17.8 GB) exceeds the chip, proves the misfit with a live allocation
attempt (recorded RESOURCE_EXHAUSTED), then serves the SAME architecture
from packed-FP8 (~9.5 GB) — measuring prefill/decode tokens/s, packed-KV
pairing, and live HBM accounting via ``device.memory_stats()``.

Setup (init + calibrate + weight-cache + pack) runs on the LOCAL CPU
backend (the r4 calib-twin discipline: tests/test_calib_twin.py proves the
timed program is independent of calibration provenance); the packed
variables transfer to the chip once. Weights are random — no 9B checkpoint
exists in this egress-free environment — which is irrelevant to a
throughput/capacity measurement.

int4 (w4a8) is a SEPARATE invocation (--modes int4): packed-FP8 and int4
trees cannot be resident together on one 16 GiB chip at this scale, so the
two runs cannot be interleaved (documented in the artifact).

Run:  python scripts/bench_llama_big.py                 # packed,packed_both
      python scripts/bench_llama_big.py --modes int4    # int4 run
      python scripts/bench_llama_big.py --smoke         # tiny CPU smoke
"""

import argparse
import gc
import os
import sys
import time

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
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.sites import QuantPhase


def fp8_qc():
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


def int4_qc():
    return QuantConfig(
        method=QMethod.symmetric_uniform,
        n_bits=4, n_bits_act=8,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        run_method=RunMethodConfig(res_quantizer_flag=True),
    )


def tree_bytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    # ~9.36B params: 36 layers x (4096 hidden, 15360 mlp) + 128256 vocab
    # embed/lm_head -> bf16 resident ~17.8 GB > 16 GiB HBM; packed-FP8
    # ~9.5 GB; int4 ~5.2 GB
    ap.add_argument("--hidden", type=int, default=4096)
    ap.add_argument("--layers", type=int, default=36)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--mlp", type=int, default=15360)
    ap.add_argument("--vocab", type=int, default=128256)
    ap.add_argument("--prefill-t", type=int, default=512)
    ap.add_argument("--decode-batch", type=int, default=4)
    ap.add_argument("--decode-s", type=int, default=2048)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--modes", type=str, default="packed,packed_both")
    ap.add_argument("--skip-oom-proof", action="store_true")
    ap.add_argument("--setup-only", action="store_true",
                    help="run the CPU-side init/calibrate/pack phase, write "
                         "the disk cache, and exit without touching the TPU "
                         "(lets the chip serve other benches meanwhile)")
    ap.add_argument("--artifact", type=str, default="llama_big_capacity")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny spec, CPU-sized — plumbing check only")
    args = ap.parse_args(argv)
    if args.smoke:
        args.hidden, args.layers, args.heads = 64, 2, 4
        args.kv_heads, args.mlp, args.vocab = 2, 128, 256
        args.prefill_t, args.decode_batch, args.decode_s = 32, 2, 64
        args.trials = 2
    want = [m for m in args.modes.split(",") if m]
    for m in want:
        if m not in ("packed", "packed_both", "int4"):
            raise SystemExit(f"unknown mode {m!r}")
    if "int4" in want and len(want) > 1:
        raise SystemExit("int4 must run alone (two weight trees at this "
                         "scale exceed the chip HBM; runs cannot interleave)")

    # threefry generation of 9.4B f32 params takes ~an hour on 2 CPU cores;
    # rbg is ~10x faster and the weights are random throughput fodder anyway
    jax.config.update("jax_default_prng_impl", "rbg")

    spec = LlamaSpec(
        vocab_size=args.vocab, hidden_size=args.hidden,
        num_layers=args.layers, num_heads=args.heads,
        num_kv_heads=args.kv_heads, mlp_dim=args.mlp,
        max_seq_len=max(args.prefill_t, args.decode_s) + 64,
    )
    n_params = (spec.vocab_size * spec.hidden_size * 2
                + spec.num_layers * (
                    2 * spec.hidden_size * spec.num_heads * spec.head_dim
                    + 2 * spec.hidden_size * spec.num_kv_heads * spec.head_dim
                    + 3 * spec.hidden_size * spec.mlp_dim
                    + 2 * spec.hidden_size)
                + spec.hidden_size)
    log(f"spec: {n_params/1e9:.2f}B params; bf16 resident ~"
        f"{n_params*2/2**30:.1f} GiB")

    qc = int4_qc() if want == ["int4"] else fp8_qc()
    rng = np.random.default_rng(10)
    calib = jnp.asarray(rng.integers(0, spec.vocab_size, size=(2, 16)),
                        jnp.int32)
    cpu = jax.local_devices(backend="cpu")[0]

    # ---- CPU-side build: init -> calibrate -> cache -> pack ----------------
    # ~80 min of 2-core CPU work at the 9.36B scale — cached to disk so
    # reruns (and the int4 invocation) skip straight to the serving phase
    import pickle

    family = "int4" if want == ["int4"] else "fp8"
    setup_cache = (f"/tmp/llama_big_setup_{family}_{args.layers}x"
                   f"{args.hidden}x{args.mlp}.pkl")
    model = QuantizedLlama(qc=qc, spec=spec)
    if os.path.exists(setup_cache) and not args.smoke:
        log(f"loading cached setup {setup_cache}...")
        with open(setup_cache, "rb") as fh:
            pk_vars = pickle.load(fh)
        report = pk_vars.pop("__report__")
    else:
      with jax.default_device(cpu):
        log("init (CPU)...")
        cache0 = KVCache.zeros(spec, 2, 64)
        variables = model.init(jax.random.key(0), calib, cache0, ESTIMATE)
        log(f"params tree: {tree_bytes(variables['params'])/2**30:.1f} GiB "
            "f32 on host; calibrating...")
        _, ups = model.apply(variables, calib, cache0, ESTIMATE,
                             mutable=["quant", "quant_est"])
        variables = {**variables, **ups}
        del ups
        gc.collect()
        log("weight-cache pass (CPU)...")
        warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
        _, ups = model.apply(variables, calib, cache0, warm,
                             mutable=["quant_cache"])
        variables = {**variables, **ups}
        del ups
        gc.collect()
        from fp8_quantization_tpu.ops.fastpath import (
            pack_dense_caches, strip_packed_params)

        log("packing dense caches (CPU, eager per-layer)...")
        pk_vars, report = pack_dense_caches(variables, qc)
        pk_vars = strip_packed_params(pk_vars)
        # the bf16 w_q caches are superseded by the byte codes; drop them so
        # they neither transfer nor sit in HBM (the packed path never reads
        # w_q when w_codes/w_i4 is present — and at this scale they ALONE
        # would not fit the chip)
        import flax

        pk_vars = flax.core.unfreeze(pk_vars)

        def drop_wq(node):
            if isinstance(node, dict):
                if "w_codes" in node or "w_i8" in node or "w_i4" in node:
                    for k in ("w_q", "w_bias"):
                        node.pop(k, None)
                for v in node.values():
                    drop_wq(v)

        drop_wq(pk_vars.get("quant_cache", {}))
        # embed stays unquantized (a gather, not a matmul) — carry it bf16:
        # exact enough for a throughput bench and half the resident bytes
        pk_vars["params"]["embed"] = pk_vars["params"]["embed"].astype(
            jnp.bfloat16)
        del variables
        gc.collect()
        if not args.smoke:
            log(f"saving setup cache {setup_cache}...")
            host = jax.tree.map(np.asarray, pk_vars)
            host["__report__"] = report
            with open(setup_cache, "wb") as fh:
                pickle.dump(host, fh, protocol=4)
            del host
            gc.collect()
    log(f"packed {len(report)} dense layers; packed tree "
        f"{tree_bytes(pk_vars)/2**30:.2f} GiB")
    if args.setup_only:
        log("--setup-only: cache written, exiting before any TPU work")
        return

    dev = jax.devices()[0]
    payload = {
        "metric": "llama_big_capacity",
        "params_b": round(n_params / 1e9, 3),
        "bf16_resident_gib": round(n_params * 2 / 2**30, 2),
        "packed_tree_gib": round(tree_bytes(pk_vars) / 2**30, 3),
        "mode_family": "int4" if want == ["int4"] else "packed_fp8",
        "prefill_t": args.prefill_t,
        "decode_batch": args.decode_batch,
        "decode_context": args.decode_s,
        "device": dev.device_kind,
        "interleaving_note": (
            "packed and packed_both share one weight tree and interleave; "
            "int4 is a separate run (two trees exceed HBM at this scale)"),
        "modes": {},
    }

    # ---- 1. prove the bf16 variant does NOT fit (live allocation) ---------
    # Runs in a SUBPROCESS with per-GiB readbacks, for two measured reasons
    # (r5, /tmp probe): (a) block_until_ready is early-acked over the
    # tunnel, so allocation "success" without a forcing readback is
    # meaningless (a 17.4 GiB constant-fill "fit" in 1 s); (b) deleting
    # device buffers does NOT return HBM to this process's allocator —
    # memory only frees on process exit, so an in-process probe poisons the
    # serving phase (the r5 first attempt OOM'd exactly this way). The
    # subprocess allocates 1 GiB f32 slabs (readback-forced) up to the bf16
    # resident size; reaching it would mean bf16 fits, failing earlier
    # measures the usable ceiling.
    if not args.skip_oom_proof and dev.platform != "cpu":
        import subprocess

        target_gib = int(-(-n_params * 2 // 2**30))
        log(f"subprocess bf16-capacity probe (target {target_gib} GiB)...")
        probe = (
            "import jax, jax.numpy as jnp\n"
            "import sys\n"
            "one = jax.jit(lambda i: jnp.full(((1<<30)//4,), i))\n"
            "bufs = []\n"
            f"for i in range({target_gib}):\n"
            "    try:\n"
            "        b = one(jnp.float32(i)); bufs.append(b)\n"
            "        assert float(b[12345]) == float(i)  # force materialize\n"
            "    except Exception as e:\n"
            "        print(f'PROBE_FAIL {len(bufs)} '\n"
            "              + str(e).splitlines()[0][:160])\n"
            "        sys.exit(0)\n"
            f"print('PROBE_FIT {target_gib}')\n"
        )
        out = subprocess.run([sys.executable, "-c", probe],
                             capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in out.stdout.splitlines()
                     if ln.startswith("PROBE_")), "PROBE_ERROR")
        log(f"probe: {line[:160]}")
        payload["bf16_alloc_target_gib"] = target_gib
        if line.startswith("PROBE_FAIL"):
            parts = line.split(" ", 2)
            payload["bf16_fits"] = False
            payload["hbm_usable_ceiling_gib"] = int(parts[1])
            payload["oom_proof"] = line[:300]
        elif line.startswith("PROBE_FIT"):
            payload["bf16_fits"] = True
            payload["oom_proof"] = "bf16-resident allocation fit on device"
        else:
            payload["oom_proof"] = ("probe subprocess failed: "
                                    + out.stderr[-200:])

    # ---- 2. transfer the packed tree once ----------------------------------
    log("transferring packed tree to device...")
    t0 = time.time()
    pk_vars = jax.device_put(pk_vars, dev)
    jax.block_until_ready(pk_vars)
    log(f"transfer done in {time.time()-t0:.0f}s")
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    if stats:
        payload["hbm_bytes_in_use_after_weights"] = int(
            stats.get("bytes_in_use", 0))
        payload["hbm_limit_bytes"] = int(stats.get("bytes_limit", 0))
        log(f"memory_stats: in_use "
            f"{stats.get('bytes_in_use',0)/2**30:.2f} GiB / limit "
            f"{stats.get('bytes_limit',0)/2**30:.2f} GiB")
    else:
        # the axon tunnel's PJRT plugin returns no memory_stats — account
        # the live buffers directly: these ARE the on-device arrays we
        # placed (their nbytes sum), and the OOM proof above is the live
        # statement that the bf16 tree cannot coexist with anything
        payload["memory_stats_available"] = False
        payload["packed_resident_bytes"] = int(tree_bytes(pk_vars))
        log(f"packed resident on device: "
            f"{tree_bytes(pk_vars)/2**30:.2f} GiB (device-array nbytes; "
            "memory_stats unsupported over the tunnel)")

    # ---- 3. serving measurements -------------------------------------------
    phase = QuantPhase(phase="fixed", fast=True, packed=True)
    setups = {}
    if want == ["int4"]:
        setups["int4"] = dict(model=model, vars=pk_vars, phase=phase,
                              kv=jnp.bfloat16)
    else:
        if "packed" in want:
            setups["packed"] = dict(model=model, vars=pk_vars, phase=phase,
                                    kv=jnp.bfloat16)
        if "packed_both" in want:
            mkv = QuantizedLlama(qc=qc, spec=spec, packed_kv=True)
            setups["packed_both"] = dict(model=mkv, vars=pk_vars, phase=phase,
                                         kv=jnp.uint8)

    t_len, b, s_len = args.prefill_t, args.decode_batch, args.decode_s
    base = jnp.asarray(rng.integers(0, spec.vocab_size, size=(1, t_len)),
                       jnp.int32)
    tok0 = jnp.asarray(rng.integers(0, spec.vocab_size, size=(b, 1)),
                       jnp.int32)

    def prefill_builder(su):
        model, ph, kvd = su["model"], su["phase"], su["kv"]

        def build(n):
            @jax.jit
            def f(variables, base):
                def body(i, acc):
                    cache = KVCache.zeros(spec, 1, t_len, dtype=kvd)
                    toks = (base + i) % spec.vocab_size
                    logits, _ = model.apply(variables, toks, cache, ph,
                                            chunk_attention=True)
                    return acc + logits[0, -1].sum()
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            return f
        return build

    def decode_builder(su):
        model, ph, kvd = su["model"], su["phase"], su["kv"]
        cache = KVCache.zeros(spec, b, s_len, dtype=kvd)
        cache = cache._replace(length=jnp.full((b,), s_len // 2, jnp.int32))

        def build(n):
            @jax.jit
            def f(variables, tok0, cache):
                def body(i, carry):
                    toks, cache, acc = carry
                    logits, cache = model.apply(variables, toks, cache, ph)
                    nxt = jnp.argmax(logits[:, -1, :], axis=-1)[:, None]
                    return (nxt.astype(jnp.int32), cache,
                            acc + logits[:, -1].sum())
                _, _, acc = lax.fori_loop(0, n, body,
                                          (tok0, cache, jnp.float32(0.0)))
                return acc
            return f
        return build, cache

    builders, args_for, kinds = {}, {}, {}
    for name, su in setups.items():
        builders[f"{name}.prefill"] = prefill_builder(su)
        args_for[f"{name}.prefill"] = (su["vars"], base)
        kinds[f"{name}.prefill"] = ("prefill", name)
        decb, cache = decode_builder(su)
        builders[f"{name}.decode"] = decb
        args_for[f"{name}.decode"] = (su["vars"], tok0, cache)
        kinds[f"{name}.decode"] = ("decode", name)

    log("measuring (first big-model remote compiles can take minutes)...")
    results = interleaved_slopes(builders, args_for, depths=(2, 8),
                                 trials=args.trials, max_n1=64)

    # decode roofline: analytic LOWER BOUND bytes (same rules as
    # bench_llama.py — weights stream once, full KV slab read)
    from fp8_quantization_tpu.utils.profiling import device_peaks

    hbm_peak = device_peaks()["hbm_gbps"]
    payload["hbm_peak_gbps"] = hbm_peak

    def decode_step_bytes(name, kvd):
        """(weights+KV lower-bound bytes, KV slab bytes) per decode step."""
        h, hd, L = spec.hidden_size, spec.head_dim, spec.num_layers
        proj = L * (h * spec.num_heads * hd + 2 * h * spec.num_kv_heads * hd
                    + spec.num_heads * hd * h + 3 * h * spec.mlp_dim)
        proj += h * spec.vocab_size
        wb = 0.5 if name == "int4" else 1
        kv_b = (2 * L * b * s_len * spec.num_kv_heads * hd
                * jnp.dtype(kvd).itemsize)
        return proj * wb + kv_b, kv_b

    impossible = []
    for cell, r in results.items():
        kind, name = kinds[cell]
        per = r["per_iter"]
        entry = payload["modes"].setdefault(name, {})
        if kind == "prefill":
            entry["prefill_ms"] = round(per * 1e3, 2) if per else None
            entry["prefill_tok_s"] = round(t_len / per, 1) if per else None
        else:
            entry["decode_step_ms"] = round(per * 1e3, 3) if per else None
            entry["decode_tok_s"] = round(b / per, 1) if per else None
            if per:
                bts, kv_b = decode_step_bytes(name, setups[name]["kv"])
                entry["kv_cache_gib"] = round(kv_b / 2**30, 3)
                gbps = bts / per / 1e9
                entry["decode_bytes_gb"] = round(bts / 1e9, 2)
                entry["hbm_gbps"] = round(gbps, 1)
                if hbm_peak == hbm_peak:
                    entry["hbm_util"] = round(gbps / hbm_peak, 4)
                    if gbps > hbm_peak:
                        impossible.append((name, gbps))
        entry[f"{kind}_floor_ok"] = r["floor_ok"]
        entry[f"{kind}_depths"] = r["depths"]
        log(f"{cell}: {(per*1e3 if per else float('nan')):.3f} ms/iter")

    try:
        stats = dev.memory_stats() or {}
        if stats:
            payload["hbm_bytes_in_use_serving"] = int(
                stats.get("bytes_in_use", 0))
    except Exception:
        pass

    med, spread = ratio(results, "packed.decode", "packed_both.decode")
    if med is not None:
        payload["packed_both_vs_packed_decode"] = round(med, 4)
        payload["packed_both_vs_packed_decode_spread"] = [
            round(spread[0], 4), round(spread[1], 4)]
    med, spread = ratio(results, "packed.prefill", "packed_both.prefill")
    if med is not None:
        payload["packed_both_vs_packed_prefill"] = round(med, 4)

    if impossible:
        for name, gbps in impossible:
            log(f"IMPOSSIBLE: {name} decode implies {gbps:.0f} GB/s > peak "
                f"{hbm_peak} — refusing to publish")
        sys.exit(1)

    emit_artifact(args.artifact, payload)


if __name__ == "__main__":
    main(sys.argv[1:])
