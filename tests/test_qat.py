"""QAT tests: param partitioning, optimizers, range learning."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.demo import QuantizedDemoModel
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.qat import (
    make_optimizer,
    make_qat_step,
    make_schedule,
    merge_variables,
    partition_variables,
)


def _qc():
    return QuantConfig(
        method=QMethod.fp_quantizer,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, learn_maxval=True,
                      mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )


@pytest.fixture
def calibrated(rng):
    model = QuantizedDemoModel(qc=_qc())
    x = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    _, ups = model.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    return model, {**variables, **ups}, x


def test_partition_roundtrip(calibrated):
    _, variables, _ = calibrated
    mp, qt, rest = partition_variables(variables)
    assert "kernel" in mp["fc"]
    # quant trainables contain maxvals but not sign_bits
    flat = jax.tree_util.tree_leaves_with_path(qt)
    names = {p[-1].key for p, _ in flat}
    assert "maxval" in names and "sign_bits" not in names
    merged = merge_variables(mp, qt, rest)
    ref_leaves = jax.tree.leaves(variables)
    new_leaves = jax.tree.leaves(merged)
    assert len(ref_leaves) == len(new_leaves)
    for a, b in zip(sorted(map(lambda t: t.sum().item(), ref_leaves)),
                    sorted(map(lambda t: t.sum().item(), new_leaves))):
        assert a == pytest.approx(b)


def test_schedules():
    s = make_schedule(0.1, "MultiStepLR:10:20", 100)
    assert s(5) == pytest.approx(0.1)
    assert s(15) == pytest.approx(0.01)
    assert s(25) == pytest.approx(0.001)
    c = make_schedule(0.1, "cosine:1e-3", 100)
    assert c(0) == pytest.approx(0.1)
    assert c(100) == pytest.approx(1e-3, rel=1e-2)
    assert make_schedule(0.1, None, 10) == 0.1
    with pytest.raises(ValueError):
        make_schedule(0.1, "exotic:1", 10)


def test_qat_learns_ranges_and_weights(calibrated, rng):
    model, variables, x = calibrated
    y = jnp.asarray(rng.integers(0, 10, size=(8,)))

    step, init_state = make_qat_step(
        model,
        make_optimizer("SGD", learning_rate=0.05),
        make_optimizer("Adam", learning_rate=0.01),
    )
    state = init_state(variables)
    maxval_before = state[1]["fc"]["weight_quantizer"]["q"]["maxval"]

    losses = []
    for _ in range(30):
        state, loss = step(state, x, y)
        losses.append(float(loss))

    assert losses[-1] < losses[0], (losses[0], losses[-1])
    maxval_after = state[1]["fc"]["weight_quantizer"]["q"]["maxval"]
    assert not np.allclose(np.asarray(maxval_before), np.asarray(maxval_after)), \
        "learnable maxval must move under QAT"


def test_estimate_ranges_train_mode(calibrated, rng):
    """The estimate_ranges_train Qstate: range params follow the estimators
    during training (not gradients)."""
    model, variables, x = calibrated
    y = jnp.asarray(rng.integers(0, 10, size=(8,)))

    step, init_state = make_qat_step(
        model, make_optimizer("SGD", learning_rate=0.05),
        estimate_ranges_train=True,
    )
    state = init_state(variables)
    x_big = x * 7.0  # much larger batch values -> allminmax must widen
    state, _ = step(state, x_big, y)
    mv = float(state[1]["fc"]["activation_quantizer"]["q"]["maxval"][0])
    assert mv == pytest.approx(float(jnp.abs(x_big).max())), \
        "maxval must track the estimator, not gradients"
    # weights still learn
    state2, loss = step(state, x, y)
    assert np.isfinite(float(loss))


def test_step_accepts_legacy_5tuple(calibrated, rng):
    """A pre-oscillation 5-tuple state (no osc carry) still drives step()
    — the osc dict is defaulted (ADVICE r2 #4)."""
    model, variables, x = calibrated
    y = jnp.asarray(rng.integers(0, 10, size=(8,)))
    step, init_state = make_qat_step(model, optax.sgd(1e-2))
    state6 = init_state(variables)
    legacy = tuple(state6)[:5]
    new_state, loss = step(legacy, x, y)
    assert len(new_state) == 6 and np.isfinite(float(loss))
    assert int(new_state.osc["step"]) == 1


def test_train_qat_cli_with_osc_flags(tmp_path):
    """The --oscillations-* flags drive a real QAT run via the train-qat
    command (ADVICE r2 #2: previously parsed but unreachable)."""
    from fp8_quantization_tpu.cli import main

    metrics = main([
        "train-qat", "--architecture", "demo_quantized", "--batch-size", "8",
        "--quantize-input", "--max-epochs", "1", "--steps-per-epoch", "2",
        "--n-bits", "4",
        "--oscillations-dampen-weight", "0.1",
        "--oscillations-freeze-threshold", "0.01",
    ])
    assert "loss" in metrics and np.isfinite(metrics["loss"])
