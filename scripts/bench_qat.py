#!/usr/bin/env python
"""QAT train-step throughput on TPU: what does quantization-aware training
cost over plain fp32 training?

The reference's QAT flow (`/root/reference/image_net.py` train path with
`--learn-ranges`-style configs) has no speed rows; this bench times one
full jitted train step (forward + backward through every fake-quant site's
custom VJP + optax updates on model AND range params) against the same
model's plain fp32 train step, interleaved slope chains as everywhere.

MobileNetV2 at 96x96 (the 224 estimate/backward graph is remote-compile
hostile over the tunnel; the QAT-vs-fp32 ratio is the shape-robust number).
``estimate_ranges_train`` mode is excluded on TPU — its in-step estimator
graph is the same pathological remote compile as calibration (CLAUDE.md);
it is CPU-tested in tests/test_qat.py.

Run: python scripts/bench_qat.py [--batch-size 64] [--size 96]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from _harness import emit_artifact, interleaved_slopes, ratio


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--trials", type=int, default=5)
    args = p.parse_args(argv)

    from fp8_quantization_tpu.config import (
        EstimatorConfig, FP8Config, QMethod, QuantConfig, RangeMethod,
        RunMethodConfig,
    )
    from fp8_quantization_tpu.models.mobilenet_v2 import QuantizedMobileNetV2
    from fp8_quantization_tpu.quant import ESTIMATE, QuantPhase
    from fp8_quantization_tpu.quant.qat import make_qat_step, merge_variables

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
    s = args.size
    b = args.batch_size
    rng = np.random.default_rng(10)
    x_np = rng.normal(size=(b, s, s, 3)).astype(np.float32)
    y_np = rng.integers(0, 100, size=(b,)).astype(np.int32)

    model = QuantizedMobileNetV2(qc=qc, num_classes=100, input_size=s)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        xc = jnp.asarray(x_np[:2])
        variables = model.init(jax.random.key(0), xc[:1], ESTIMATE)
        _, ups = model.apply(variables, xc, ESTIMATE,
                             mutable=["quant", "quant_est"])
        variables = {**variables, **ups}

    step, init_state = make_qat_step(model, optax.sgd(1e-3, momentum=0.9))
    with jax.default_device(cpu):
        state0 = init_state(variables)

    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(x_np), dev)
    y = jax.device_put(jnp.asarray(y_np), dev)
    state0 = jax.device_put(state0, dev)
    variables_dev = jax.device_put(variables, dev)

    # plain fp32 training twin: same architecture, quantization off, model
    # params only (the reference's unquantized baseline training)
    fp32_phase = QuantPhase(phase="fixed", quant_w=False, quant_a=False)
    opt = optax.sgd(1e-3, momentum=0.9)

    def qat_build(n):
        @jax.jit
        def f(state, x, y):
            def body(_, carry):
                st, acc = carry
                st, loss = step(st, x, y)
                return (st, acc + loss)
            _, acc = lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
            return acc
        return f

    def fp32_build(n):
        @jax.jit
        def f(variables, x, y):
            params0 = variables["params"]
            rest = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(params):
                logits = model.apply({**rest, "params": params}, x,
                                     fp32_phase)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            def body(_, carry):
                params, ostate, acc = carry
                loss, g = jax.value_and_grad(loss_fn)(params)
                upd, ostate = opt.update(g, ostate, params)
                params = optax.apply_updates(params, upd)
                return (params, ostate, acc + loss)

            _, _, acc = lax.fori_loop(
                0, n, body, (params0, opt.init(params0), jnp.float32(0.0)))
            return acc
        return f

    results = interleaved_slopes(
        {"qat": qat_build, "fp32_train": fp32_build},
        {"qat": (state0, x, y), "fp32_train": (variables_dev, x, y)},
        depths=(2, 6), trials=args.trials, max_n1=64)

    payload = {"metric": "qat_train_step", "batch_size": b, "input_size": s,
               "impls": {}}
    for name, r in results.items():
        per = r["per_iter"]
        payload["impls"][name] = {
            "ms_per_step": round(per * 1e3, 3) if per else None,
            "imgs_per_sec": round(b / per, 1) if per else None,
            "floor_ok": r["floor_ok"], "depths": r["depths"],
        }
        print(f"{name:10s}: {(per * 1e3 if per else float('nan')):8.2f} "
              f"ms/step", flush=True)
    med, spread = ratio(results, "fp32_train", "qat")
    if med is not None:
        payload["qat_vs_fp32_train"] = round(med, 4)
        payload["qat_vs_fp32_train_spread"] = [round(spread[0], 4),
                                               round(spread[1], 4)]
        print(f"qat_vs_fp32_train: {med:.3f}x (fp32 step time / qat step "
              f"time; <1 means QAT costs more)", flush=True)
    emit_artifact("qat_train", payload)


if __name__ == "__main__":
    main(sys.argv[1:])
