#!/usr/bin/env python
"""Data-parallel eval throughput scaling over the device mesh.

BASELINE target: >= 85% scaling efficiency to 2 hosts. This machine exposes
one chip, so run this on a pod slice (or `--force-cpu-devices N` to validate
the mechanics on a virtual host mesh). Measures the jitted quantized eval
step (model forward + metric update, psum-reduced) at mesh sizes 1..N and
reports imgs/sec and efficiency vs linear scaling.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--force-cpu-devices", type=int, default=0,
                   help="virtualize N CPU devices (mechanics validation only)")
    p.add_argument("--per-device-batch", type=int, default=32)
    p.add_argument("--image-size", type=int, default=96)
    p.add_argument("--depths", type=int, nargs=2, default=(2, 6))
    args = p.parse_args(argv)

    if args.force_cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from fp8_quantization_tpu.config import (
        EstimatorConfig,
        FP8Config,
        QMethod,
        QuantConfig,
        RangeMethod,
        RunMethodConfig,
    )
    from fp8_quantization_tpu.eval.metrics import MetricState, update_metrics
    from fp8_quantization_tpu.models.mobilenet_v2 import QuantizedMobileNetV2
    from fp8_quantization_tpu.parallel import make_mesh, shard_batch, shard_variables
    from fp8_quantization_tpu.quant import ESTIMATE, QuantPhase

    qc = QuantConfig(
        method=QMethod.fp_quantizer, per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )
    model = QuantizedMobileNetV2(qc=qc, num_classes=100,
                                 input_size=args.image_size)
    rng = np.random.default_rng(10)
    n_dev = len(jax.devices())
    qp = QuantPhase(phase="fixed")

    x1 = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x1, ESTIMATE)
    _, ups = model.apply(
        variables,
        jnp.asarray(rng.normal(size=(2, args.image_size, args.image_size, 3)),
                    jnp.float32),
        ESTIMATE, mutable=["quant", "quant_est"],
    )
    variables = {**variables, **ups}

    def measure(n):
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        batch = n * args.per_device_batch
        x = jnp.asarray(rng.normal(
            size=(batch, args.image_size, args.image_size, 3)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 100, size=(batch,)), jnp.int32)
        with mesh:
            vs = shard_variables(variables, mesh)
            xs, ys = shard_batch(x, mesh), shard_batch(y, mesh)

            def build(depth):
                @jax.jit
                def f(vs, xs, ys):
                    def body(_, state):
                        logits = model.apply(vs, xs, qp)
                        return update_metrics(state, logits, ys)
                    return lax.fori_loop(0, depth, body,
                                         MetricState.zero()).count
                return f

            ts = {}
            for d in args.depths:
                f = build(d)
                float(f(vs, xs, ys))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f(vs, xs, ys))
                    best = min(best, time.perf_counter() - t0)
                ts[d] = best
        d0, d1 = args.depths
        per_step = (ts[d1] - ts[d0]) / (d1 - d0)
        return batch / per_step

    sizes = sorted({1, 2, n_dev} & set(range(1, n_dev + 1)))
    base = None
    for n in sizes:
        ips = measure(n)
        if base is None:
            base = ips
        eff = ips / (base * n)
        print(f"devices={n}: {ips:10.1f} imgs/sec  efficiency={eff:.3f}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
