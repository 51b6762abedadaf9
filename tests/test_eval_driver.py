"""Eval driver tests: metrics, demo-model E2E, BN re-estimation, mini-test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.config import (
    ApproxConfig,
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.eval import (
    MetricState,
    evaluate,
    finalize_metrics,
    strided_batches,
    synthetic_batches,
    update_metrics,
    validate_quantized,
    write_result_file,
)
from fp8_quantization_tpu.models.demo import QuantizedDemoModel
from fp8_quantization_tpu.quant import ESTIMATE


def _qc(**kw):
    return QuantConfig(
        method=QMethod.fp_quantizer,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
        **kw,
    )


class TestMetrics:
    def test_accuracy_and_topk(self):
        logits = jnp.asarray([
            [5.0, 1.0, 0.0, 0.0, 0.0, 0.0],   # pred 0, label 0: top1 hit
            [1.0, 5.0, 4.0, 3.0, 2.0, 0.0],   # pred 1, label 5: top5 miss
            [1.0, 5.0, 4.0, 3.0, 2.0, 1.5],   # pred 1, label 4: top5 hit
        ])
        labels = jnp.asarray([0, 5, 4])
        m = finalize_metrics(update_metrics(MetricState.zero(), logits, labels))
        assert m["top_1_accuracy"] == pytest.approx(1 / 3)
        assert m["top_5_accuracy"] == pytest.approx(2 / 3)
        assert m["loss"] > 0

    def test_merge_equals_single_pass(self, rng):
        logits = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 10, size=(8,)))
        full = update_metrics(MetricState.zero(), logits, labels)
        a = update_metrics(MetricState.zero(), logits[:3], labels[:3])
        b = update_metrics(MetricState.zero(), logits[3:], labels[3:])
        np.testing.assert_allclose(
            np.asarray(a.merge(b)), np.asarray(full), rtol=1e-6
        )


class TestDemoE2E:
    def test_validate_quantized_demo(self, rng, tmp_path):
        model = QuantizedDemoModel(qc=_qc())
        x0 = jnp.zeros((4, 10), jnp.float32)
        variables = model.init(jax.random.key(0), x0, ESTIMATE)

        calib = [rng.normal(size=(4, 10)).astype(np.float32) for _ in range(2)]
        eval_batches = [
            (rng.normal(size=(4, 10)).astype(np.float32),
             rng.integers(0, 10, size=(4,)))
            for _ in range(3)
        ]
        metrics, calibrated = validate_quantized(
            model, variables, calib, eval_batches, num_est_batches=2
        )
        assert set(metrics) == {"top_1_accuracy", "top_5_accuracy", "loss"}
        assert 0 <= metrics["top_1_accuracy"] <= 1

        # evaluation with frozen state is deterministic
        m2 = evaluate(model, calibrated, eval_batches)
        assert m2 == metrics

        # quantization off reproduces FP32
        m_fp32 = evaluate(model, calibrated, eval_batches,
                          quant_w=False, quant_a=False)
        assert m_fp32["loss"] != metrics["loss"]

        path = write_result_file(
            str(tmp_path), "demo_quantized", ApproxConfig(), RunMethodConfig(),
            metrics,
        )
        content = open(path).read()
        assert "final_metrics" in content and "top_1_accuracy" in content
        assert "E3M4D3" in path

    def test_mini_test_strided(self):
        batches = list(range(100))
        picked = list(strided_batches(batches, num_batches=10, start_index=5,
                                      step=9))
        assert picked == [5, 14, 23, 32, 41, 50, 59, 68, 77, 86]

    def test_synthetic_batches_deterministic(self):
        a = list(synthetic_batches(2, 3, image_size=8, seed=7))
        b = list(synthetic_batches(2, 3, image_size=8, seed=7))
        for (xa, ya), (xb, yb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)

    def test_validate_quantized_demo_packed(self, rng):
        """--packed-weights pipeline: calibrate -> freeze -> byte-pack ->
        evaluate under QuantPhase.packed, for both quantizer families."""
        for method in (QMethod.fp_quantizer, QMethod.symmetric_uniform):
            qc = _qc() if method == QMethod.fp_quantizer else QuantConfig(
                method=method, quantize_input=True,
                weight_range=EstimatorConfig(RangeMethod.current_minmax),
                act_range=EstimatorConfig(RangeMethod.allminmax),
                run_method=RunMethodConfig())
            model = QuantizedDemoModel(qc=qc)
            x0 = jnp.zeros((4, 10), jnp.float32)
            variables = model.init(jax.random.key(0), x0, ESTIMATE)
            calib = [rng.normal(size=(4, 10)).astype(np.float32)]
            eval_batches = [
                (rng.normal(size=(4, 10)).astype(np.float32),
                 rng.integers(0, 10, size=(4,)))
                for _ in range(2)
            ]
            m_packed, vp = validate_quantized(
                model, variables, calib, eval_batches, num_est_batches=1,
                packed=True, qc=qc, calib_example=x0,
            )
            m_plain = evaluate(model, vp, eval_batches)
            assert set(m_packed) == {"top_1_accuracy", "top_5_accuracy",
                                     "loss"}
            # packed logits track the plain path closely on this tiny model
            assert abs(m_packed["loss"] - m_plain["loss"]) < 0.05


class TestApproxCompilerOptions:
    """utils.misc.approx_compiler_options — the package-level scoped-VMEM
    policy for approx-armed conv models (ROADMAP r5 #5: the 64 MiB override
    moved from a bench knob into the model entry points)."""

    def _model(self, approx):
        import dataclasses

        rm = RunMethodConfig(res_quantizer_flag=True,
                             original_quantize_res=True,
                             approx_flag=approx)
        qc = dataclasses.replace(_qc(), run_method=rm,
                                 approx=ApproxConfig(with_approx=approx))
        return QuantizedDemoModel(qc=qc)

    def test_none_for_sim_model(self):
        from fp8_quantization_tpu.utils.misc import approx_compiler_options
        assert approx_compiler_options(self._model(False)) is None

    def test_none_on_cpu_backend(self):
        # conftest forces the CPU backend; the TPU-only option must never
        # reach a CPU compile (the plugin rejects unknown flags)
        from fp8_quantization_tpu.utils.misc import approx_compiler_options
        assert jax.default_backend() == "cpu"
        assert approx_compiler_options(self._model(True)) is None

    def test_dict_on_tpu_backend(self, monkeypatch):
        from fp8_quantization_tpu.utils import misc
        monkeypatch.setattr(misc.jax, "default_backend", lambda: "axon")
        opts = misc.approx_compiler_options(self._model(True))
        assert opts == {"xla_tpu_scoped_vmem_limit_kib": 65536}
        # no model given = unconditional backend-only policy (bench override)
        assert misc.approx_compiler_options() == opts

    def test_driver_accepts_armed_model_on_cpu(self, rng):
        # the approx demo eval must still run on CPU with the automatic
        # policy in place (compiler_options=None path through calibrate +
        # evaluate)
        model = self._model(True)
        x0 = jnp.zeros((4, 10), jnp.float32)
        variables = model.init(jax.random.key(0), x0, ESTIMATE)
        calib = [rng.normal(size=(4, 10)).astype(np.float32)]
        eval_batches = [(rng.normal(size=(4, 10)).astype(np.float32),
                         rng.integers(0, 10, size=(4,)))]
        metrics, _ = validate_quantized(model, variables, calib, eval_batches,
                                        num_est_batches=1)
        assert 0 <= metrics["top_1_accuracy"] <= 1
