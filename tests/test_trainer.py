"""QAT trainer driver + BASELINE-config integration tests."""

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
from fp8_quantization_tpu.eval.trainer import train_qat
from fp8_quantization_tpu.models.demo import QuantizedDemoModel
from fp8_quantization_tpu.quant import ESTIMATE, FIXED


def _qc(**kw):
    base = dict(
        method=QMethod.fp_quantizer,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, learn_maxval=True,
                      mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )
    base.update(kw)
    return QuantConfig(**base)


def test_train_qat_improves_loss(rng, tmp_path):
    model = QuantizedDemoModel(qc=_qc())
    x0 = jnp.zeros((8, 10), jnp.float32)
    variables = model.init(jax.random.key(0), x0, ESTIMATE)
    _, ups = model.apply(variables, jnp.asarray(rng.normal(size=(8, 10)),
                                                jnp.float32),
                         ESTIMATE, mutable=["quant", "quant_est"])
    variables = {**variables, **ups}

    data = [(rng.normal(size=(8, 10)).astype(np.float32),
             rng.integers(0, 10, size=(8,)).astype(np.int32))
            for _ in range(4)]

    variables, history = train_qat(
        model, variables,
        train_batches=lambda: iter(data),
        eval_batches=lambda: iter(data),
        max_epochs=4,
        optimizer="Adam",
        learning_rate=5e-2,
        sep_quant_optimizer=True,
        save_checkpoint_dir=str(tmp_path),
        tb_logging_dir=str(tmp_path / "tb"),
    )
    assert len(history) == 4
    assert history[-1]["loss"] < history[0]["loss"]
    assert "top_1_accuracy" in history[-1]
    # checkpoint restorable
    from fp8_quantization_tpu.utils.checkpoint import load_checkpoint

    restored = load_checkpoint(str(tmp_path / "latest"), variables)
    y1 = model.apply(variables, x0, FIXED)
    y2 = model.apply(restored, x0, FIXED)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


class TestBaselineConfigs:
    def test_resnet18_approx_ofuf(self, rng):
        """BASELINE config[1]: ResNet-18 approx_v9 matmul + BN-folded conv
        with sim_hw_add_OFUF on (tiny shapes)."""
        from fp8_quantization_tpu.models.resnet import QuantizedResNet

        qc = _qc(
            per_channel_weights=True,
            run_method=RunMethodConfig(approx_flag=True,
                                       res_quantizer_flag=True,
                                       original_quantize_res=True),
            approx=ApproxConfig(expo_width=3, mant_width=4, with_approx=True,
                                with_comp=True, sim_hw_add_ofuf=True,
                                with_of_opt=True, with_uf_opt=True),
        )
        model = QuantizedResNet(qc=qc, depth=18, num_classes=5)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
        variables = model.init(jax.random.key(0), x, ESTIMATE)
        _, ups = model.apply(variables, x, ESTIMATE,
                             mutable=["quant", "quant_est"])
        variables = {**variables, **ups}
        out = model.apply(variables, x, FIXED)
        assert out.shape == (1, 5)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_vit_per_channel_mse_qama(self, rng):
        """BASELINE config[2]: ViT with per-channel MSE weight ranges and
        res_quantizer after mult-and-add (tiny spec)."""
        from fp8_quantization_tpu.models.vit import QuantizedViT, ViTSpec

        qc = _qc(
            per_channel_weights=True,
            weight_range=EstimatorConfig(RangeMethod.MSE),
            run_method=RunMethodConfig(quantize_after_mult_and_add=True,
                                       res_quantizer_flag=True,
                                       original_quantize_res=True),
        )
        spec = ViTSpec(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32,
                       patch_size=8, image_size=16, num_classes=3)
        model = QuantizedViT(qc=qc, spec=spec)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
        variables = model.init(jax.random.key(0), x, ESTIMATE)
        _, ups = model.apply(variables, x, ESTIMATE,
                             mutable=["quant", "quant_est"])
        variables = {**variables, **ups}
        out = model.apply(variables, x, FIXED)
        assert out.shape == (2, 3)
        assert np.all(np.isfinite(np.asarray(out)))
