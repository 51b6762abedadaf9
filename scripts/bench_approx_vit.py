#!/usr/bin/env python
"""Approx-multiplier MODEL-LEVEL eval throughput on TPU (VERDICT r4 next #2).

The reference's flagship experiment is running a whole quantized model
through the approximate-multiplier simulation
(`/root/reference/approx_output/vit_quantized/E3M4D3/`, driven by the
per-out-channel kernel loop at approx_calculation.py:613-638). This repo's
approx path was parity-tested at layer level and microbenched at 512^3
(bench_artifacts/approx_matmul.json, 519.9x the materialization oracle) —
this bench produces the missing MODEL-level number: ms/img for an
approx-mode ViT-B/16 (every q/k/v/o/mlp projection and the patch-embed conv
through the fused Pallas approx kernel at E3M4 D3 withComp), interleaved
against the plain FP8 simulation and the bf16 fast mode, plus the projected
wall time of the reference's 160-image mini-test.

MobileNetV2 (--arch mobilenet_v2) routes its grouped/depthwise convs
through the vmapped jnp oracle (pallas_call does not vmap) — expected far
slower; the artifact records the honest split.

Calibration runs once on the local CPU backend; the sim and approx models
share one variables tree (run_method switches live in the module config,
not in variables — same ranges, same weights).

Run: python scripts/bench_approx_vit.py [--batch-size 16] [--arch vit]
"""

import argparse
import functools
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _harness import emit_artifact, interleaved_slopes, ratio


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arch", type=str, default="vit",
                   choices=["vit", "mobilenet_v2"])
    p.add_argument("--batch-size", type=int, default=16)  # image_net.sh: 16
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--modes", type=str, default="fixed,fast,approx")
    p.add_argument("--artifact", type=str, default=None)
    p.add_argument("--scoped-vmem-kib", type=int, default=None,
                   help="raise XLA's scoped-VMEM stack limit (default "
                        "16384 kib) for the timed programs via per-jit "
                        "compiler_options. MobileNetV2's approx mode needs "
                        "this: XLA places approx-kernel outputs in scoped "
                        "VMEM inside the conv-body fusions and the "
                        "kernel stack + S(1) buffers exceed 16 MiB at "
                        "several conv shapes (r5; the v5e has 128 MiB "
                        "VMEM, so 64 MiB scoped is safe). Cannot go via "
                        "XLA_FLAGS: the local CPU plugin fatals on "
                        "TPU-only flags.")
    args = p.parse_args(argv)
    want = set(args.modes.split(","))

    import dataclasses

    from fp8_quantization_tpu.config import (
        ApproxConfig, EstimatorConfig, FP8Config, QMethod, QuantConfig,
        RangeMethod, RunMethodConfig,
    )
    from fp8_quantization_tpu.eval import cache_quantized_weights
    from fp8_quantization_tpu.quant import ESTIMATE, QuantPhase

    # the reference's flagship config: E3M4, dnsmp 3, withComp
    # (approx_output/vit_quantized/E3M4D3/D3_2024-11-06_12-01-22.txt)
    approx_cfg = ApproxConfig(expo_width=3, mant_width=4, dnsmp_factor=3,
                              with_comp=True, with_approx=True)
    qc_sim = QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
        approx=approx_cfg,
    )
    qc_approx = dataclasses.replace(
        qc_sim,
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True,
                                   approx_flag=True),
    )

    def build(qc):
        if args.arch == "vit":
            from fp8_quantization_tpu.models.vit import QuantizedViT
            return QuantizedViT(qc=qc)
        from fp8_quantization_tpu.models.mobilenet_v2 import (
            QuantizedMobileNetV2)
        return QuantizedMobileNetV2(qc=qc)

    rng = np.random.default_rng(10)
    b = args.batch_size
    x_np = rng.normal(size=(b, 224, 224, 3)).astype(np.float32)
    x = jnp.asarray(x_np)
    cpu = jax.local_devices(backend="cpu")[0]

    model_sim = build(qc_sim)
    model_approx = build(qc_approx)
    print("init + calibrate (CPU backend)...", flush=True)
    with jax.default_device(cpu):
        xc = jnp.asarray(x_np[:2])
        variables = model_sim.init(jax.random.key(0), xc[:1], ESTIMATE)
        _, ups = model_sim.apply(variables, xc, ESTIMATE,
                                 mutable=["quant", "quant_est"])
        variables = {**variables, **ups}
        fast_vars = cache_quantized_weights(model_sim, variables, xc,
                                            fast=True)

    fixed = QuantPhase(phase="fixed")
    modes = {}
    if "fp32" in want:
        modes["fp32"] = (model_sim, variables,
                         QuantPhase(phase="fixed", quant_w=False,
                                    quant_a=False))
    if "fixed" in want:
        modes["fixed"] = (model_sim, variables, fixed)
    if "fast" in want:
        modes["fast"] = (model_sim, fast_vars,
                         QuantPhase(phase="fixed", fast=True))
    if "approx" in want:
        # the approx rerun consumes the SAME calibrated tree; approx_flag
        # arms the special path (fixed phase — the reference protocol runs
        # the plain product first under original_quantize_res, then the
        # approx product replaces it: hijacker.py:88-102)
        modes["approx"] = (model_approx, variables, fixed)

    dev = jax.devices()[0]
    if dev.platform != "cpu":
        print("transferring variables to device...", flush=True)
        modes = {k: (m, jax.device_put(v, dev), qp)
                 for k, (m, v, qp) in modes.items()}
        jax.block_until_ready([v for _, v, _ in modes.values()])
        x = jax.device_put(x, dev)

    # default to the package-level policy (utils.misc.approx_compiler_options
    # — the model entry points now apply this automatically); the CLI knob
    # stays as an explicit override for sweeping the limit
    from fp8_quantization_tpu.utils.misc import approx_compiler_options

    copts = ({"xla_tpu_scoped_vmem_limit_kib": args.scoped_vmem_kib}
             if args.scoped_vmem_kib
             else approx_compiler_options(model_approx))

    def builder(model, vs, qp):
        def build_fn(n):
            @functools.partial(jax.jit, compiler_options=copts)
            def f(variables, x):
                def body(_, acc):
                    logits = model.apply(variables, acc, qp)
                    return acc + 1e-30 * jnp.mean(logits)
                return lax.fori_loop(0, n, body, x).sum()
            return f
        return build_fn

    builders = {name: builder(*spec) for name, spec in modes.items()}
    args_for = {name: (modes[name][1], x) for name in modes}

    print("measuring (first approx-kernel compiles are slow: the fused "
          "kernel compiles per matmul shape)...", flush=True)
    results = interleaved_slopes(builders, args_for, depths=(2, 6),
                                 trials=args.trials, max_n1=64)

    payload = {
        "metric": f"{args.arch}_approx_e2e",
        "batch_size": b,
        "unit": "ms/batch",
        "approx_format": "E3M4 dnsmp3 withComp (the reference flagship "
                         "config)",
        "modes": {},
    }
    for name, r in results.items():
        per = r["per_iter"]
        payload["modes"][name] = {
            "ms_per_batch": round(per * 1e3, 3) if per else None,
            "ms_per_img": round(per * 1e3 / b, 3) if per else None,
            "imgs_per_sec": round(b / per, 1) if per else None,
            "floor_ok": r["floor_ok"],
            "depths": r["depths"],
        }
        print(f"{name:8s}: {(per * 1e3 if per else float('nan')):9.2f} "
              f"ms/batch", flush=True)

    # the reference's mini-test = 10 strided batches of 16 images
    # (image_net.py:171-179); project its eval wall time at these rates
    ap = payload["modes"].get("approx", {}).get("ms_per_img")
    if ap is not None:
        payload["projected_minitest_160img_s"] = round(160 * ap / 1e3, 2)

    for num, den, label in [
        ("fixed", "approx", "approx_vs_fixed"),
        ("fast", "approx", "approx_vs_fast"),
        ("fp32", "fixed", "fixed_vs_fp32"),
    ]:
        med, spread = ratio(results, num, den)
        if med is not None:
            payload[label] = round(med, 4)
            payload[label + "_spread"] = [round(spread[0], 4),
                                          round(spread[1], 4)]
            print(f"{label}: {med:.3f}x (spread {spread[0]:.3f}-"
                  f"{spread[1]:.3f})", flush=True)

    emit_artifact(args.artifact or f"{args.arch}_approx_e2e", payload)


if __name__ == "__main__":
    main(sys.argv[1:])
