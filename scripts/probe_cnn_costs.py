#!/usr/bin/env python
"""Probe: where does int8 CNN serving time go on the v5e? (round 4)

MobileNetV2 int8 serving measured 2.6x SLOWER than the unquantized fp32
model (bench_artifacts/cnn_mobilenet_v2.json, VERDICT r3 weak #2) while
ResNet-18 int8 lands within 10% of fp32. The architectural difference is
depthwise convolutions + per-site elementwise chains on many small layers.
This probe times the suspects IN ISOLATION at real MobileNet shapes, int8
codes vs f32, so the round-4 fusion work attacks the measured bottleneck:

  dw112 / dw56:  3x3 depthwise conv (feature_group_count=C) — MXU-hostile;
                 does the int8->int32 lowering beat or lose to f32?
  pw56:          1x1 pointwise conv (matmul-shaped) — int8 MXU should win 2x
  stem:          3x3 s2 conv on 3 input channels
  site_chain:    the fused elementwise inter-conv chain of the int8 path
                 (int32 acc -> dequant affine -> BN -> relu6 -> requant int8)
  site_fq:       same + the res-site fake-quant round-trip in the middle
                 (what RunMethodConfig(res_quantizer_flag=True) adds)

Self-contained: no fp8_quantization_tpu imports (safe to edit the package
while this runs on the chip).
"""

import sys

sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _harness import emit_artifact, interleaved_slopes, ratio

B = 64
DN = ("N", "HWC"[:2] + "C", "NHWC")  # built below properly


def dw_builder(shape, dtype_int, explicit_pad):
    """3x3 depthwise conv chain at ``shape``=(B,H,W,C)."""
    _, h, w, c = shape

    def build(n):
        @jax.jit
        def f(x, k):
            def body(_, acc):
                if dtype_int:
                    if explicit_pad:
                        xp = lax.pad(acc, jnp.int8(0),
                                     [(0, 0, 0), (1, 1, 0), (1, 1, 0),
                                      (0, 0, 0)])
                        pads = [(0, 0), (0, 0)]
                    else:
                        xp, pads = acc, [(1, 1), (1, 1)]
                    out = lax.conv_general_dilated(
                        xp, k, window_strides=(1, 1), padding=pads,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        feature_group_count=c,
                        preferred_element_type=jnp.int32)
                    # minimal epilogue back to int8 codes
                    y = jnp.clip(jnp.round(out.astype(jnp.float32) * 0.02),
                                 -128, 127)
                    return y.astype(jnp.int8)
                out = lax.conv_general_dilated(
                    acc, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=c,
                    preferred_element_type=jnp.float32)
                return jnp.clip(out, -1.0, 1.0)  # keep the chain bounded
            return lax.fori_loop(0, n, body, x).astype(jnp.float32).sum()
        return f
    return build


def pw_builder(shape, dtype_int):
    """1x1 pointwise conv chain (C -> C)."""
    _, h, w, c = shape

    def build(n):
        @jax.jit
        def f(x, k):
            def body(_, acc):
                if dtype_int:
                    out = lax.conv_general_dilated(
                        acc, k, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32)
                    y = jnp.clip(jnp.round(out.astype(jnp.float32) * 2e-4),
                                 -128, 127)
                    return y.astype(jnp.int8)
                out = lax.conv_general_dilated(
                    acc, k, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                return jnp.clip(out, -1.0, 1.0)
            return lax.fori_loop(0, n, body, x).astype(jnp.float32).sum()
        return f
    return build


def site_builder(shape, with_fake_quant):
    """Elementwise inter-conv chain of the int8 serving path, on int8 codes:
    upcast (stand-in for the conv's int32 acc) -> dequant affine -> [res-site
    fake-quant] -> BN affine -> relu6 -> requant -> int8."""
    _, h, w, c = shape

    def build(n):
        @jax.jit
        def f(x, gamma, beta):
            def body(_, acc):
                a = acc.astype(jnp.int32) * 3          # fake int32 acc
                v = a.astype(jnp.float32) * 0.01 - 0.1  # dequant affine
                if with_fake_quant:
                    # res-site fake-quant round-trip (uniform, per-tensor)
                    s = jnp.float32(0.05)
                    v = s * jnp.clip(jnp.round(v / s), -128, 127)
                v = v * gamma + beta                    # BN (inference affine)
                v = jnp.clip(v, 0.0, 6.0)               # relu6
                y = jnp.clip(jnp.round(v / 0.03), -128, 127)  # next act quant
                return y.astype(jnp.int8)
            return lax.fori_loop(0, n, body, x).astype(jnp.float32).sum()
        return f
    return build


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(7)

    s112 = (B, 112, 112, 96)
    s56 = (B, 56, 56, 144)

    def codes(shape):
        return jnp.asarray(
            rng.integers(-100, 100, size=shape).astype(np.int8))

    def floats(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)

    builders, args_for = {}, {}

    for tag, shape in (("dw112", s112), ("dw56", s56)):
        c = shape[-1]
        k8 = jnp.asarray(rng.integers(-8, 8, size=(3, 3, 1, c)).astype(np.int8))
        kf = jnp.asarray(rng.normal(size=(3, 3, 1, c)).astype(np.float32) * 0.1)
        builders[f"{tag}_i8"] = dw_builder(shape, True, True)
        args_for[f"{tag}_i8"] = (codes(shape), k8)
        builders[f"{tag}_f32"] = dw_builder(shape, False, False)
        args_for[f"{tag}_f32"] = (floats(shape), kf)
    # pad-vs-convpad isolate (56 only)
    builders["dw56_i8_convpad"] = dw_builder(s56, True, False)
    args_for["dw56_i8_convpad"] = (codes(s56), args_for["dw56_i8"][1])

    c = s56[-1]
    k8 = jnp.asarray(rng.integers(-30, 30, size=(1, 1, c, c)).astype(np.int8))
    kf = jnp.asarray(rng.normal(size=(1, 1, c, c)).astype(np.float32) * 0.05)
    builders["pw56_i8"] = pw_builder(s56, True)
    args_for["pw56_i8"] = (codes(s56), k8)
    builders["pw56_f32"] = pw_builder(s56, False)
    args_for["pw56_f32"] = (floats(s56), kf)

    gamma = jnp.asarray(rng.normal(size=(s56[-1],)).astype(np.float32) * 0.1 + 1)
    beta = jnp.asarray(rng.normal(size=(s56[-1],)).astype(np.float32) * 0.1)
    builders["site_chain"] = site_builder(s56, False)
    args_for["site_chain"] = (codes(s56), gamma, beta)
    builders["site_fq"] = site_builder(s56, True)
    args_for["site_fq"] = (codes(s56), gamma, beta)

    results = interleaved_slopes(builders, args_for, depths=(2, 6), trials=5,
                                 max_n1=256)

    payload = {"metric": "cnn_cost_probe", "batch": B, "impls": {}}
    for name, r in results.items():
        per = r["per_iter"]
        payload["impls"][name] = {
            "us_per_iter": round(per * 1e6, 1) if per else None,
            "floor_ok": r["floor_ok"], "depths": r["depths"],
        }
        print(f"{name:16s}: {(per * 1e6 if per else float('nan')):9.1f} us",
              flush=True)
    for a, b, label in [
        ("dw112_i8", "dw112_f32", "dw112_i8_vs_f32"),
        ("dw56_i8", "dw56_f32", "dw56_i8_vs_f32"),
        ("dw56_i8", "dw56_i8_convpad", "explicit_pad_cost"),
        ("pw56_i8", "pw56_f32", "pw56_i8_vs_f32"),
        ("site_fq", "site_chain", "res_fq_cost"),
    ]:
        med, spread = ratio(results, a, b)
        if med is not None:
            payload[label] = round(med, 4)
            print(f"{label}: {med:.3f} (a/b time ratio; >1 = a slower)",
                  flush=True)
    emit_artifact("cnn_cost_probe", payload)


if __name__ == "__main__":
    main()
