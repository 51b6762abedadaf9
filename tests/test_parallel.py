"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.eval import MetricState, update_metrics
from fp8_quantization_tpu.models.demo import QuantizedDemoModel
from fp8_quantization_tpu.parallel import make_mesh, shard_batch, shard_variables
from fp8_quantization_tpu.quant import ESTIMATE, FIXED

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _qc():
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


def test_sharded_calibration_matches_single_device(rng):
    """Calibration over a (2, 4) mesh must produce the same ranges and eval
    outputs as single-device execution (global reductions via GSPMD)."""
    model = QuantizedDemoModel(qc=_qc(), features=16)
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)

    # single-device reference
    _, ups_ref = model.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    y_ref = model.apply({**variables, **ups_ref}, x, FIXED)

    mesh = make_mesh(data=2, model=4)
    with mesh:
        sharded_vars = shard_variables(variables, mesh)
        xs = shard_batch(x, mesh)

        @jax.jit
        def calib(v, x):
            _, ups = model.apply(v, x, ESTIMATE, mutable=["quant", "quant_est"])
            return ups

        ups = calib(sharded_vars, xs)
        merged = {**sharded_vars, **ups}

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x, FIXED)

        y = fwd(merged, xs)

    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ups["quant"]["fc"]["weight_quantizer"]["q"]["maxval"]),
        np.asarray(ups_ref["quant"]["fc"]["weight_quantizer"]["q"]["maxval"]),
        rtol=1e-6,
    )


def test_sharded_metrics_match(rng):
    logits = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 32, size=(8,)))
    ref = update_metrics(MetricState.zero(), logits, labels)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        ls = shard_batch(logits, mesh)
        ys = shard_batch(labels, mesh)

        @jax.jit
        def step(l, y):
            return update_metrics(MetricState.zero(), l, y)

        out = step(ls, ys)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
