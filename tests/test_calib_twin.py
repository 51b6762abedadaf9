"""Small-input calibration-twin validity (VERDICT r3 next #2).

MobileNetV2's estimate-phase graph at 224x224 exceeds practical
remote-compile time on the tunneled chip, so `scripts/bench_cnn.py
--calib-size` calibrates a structural TWIN built at a smaller input size
(only the avg-pool window derives from ``input_size``) and loads the
resulting variables into the 224 model for the timed cells. These tests pin
exactly why that is valid for a THROUGHPUT bench:

1. the twin's calibrated variables tree is structurally IDENTICAL to a
   direct calibration of the big model (same keys/shapes/dtypes, including
   every packed-cache key — weight quantizer state depends only on the
   kernel, never the data, so the data-dependent packing decisions agree
   bit-for-bit);
2. the timed program is the SAME compiled graph either way (leaf values are
   jit arguments, not constants): the optimized HLO of the big model's
   serving step is byte-identical under twin-calibrated vs
   directly-calibrated variables;
3. the twin's variables load into the big model and produce finite logits
   through the serving phases.

Accuracy-bearing runs still calibrate at the eval resolution (activation
RANGES do depend on input statistics); the twin claim is about graph/speed
only, and `docs/PERF_NOTES.md` documents that split.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.eval import cache_quantized_weights
from fp8_quantization_tpu.models.mobilenet_v2 import QuantizedMobileNetV2
from fp8_quantization_tpu.ops.fastpath import (
    pack_dense_caches,
    strip_packed_params,
)
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.sites import CHAINED, PACKED


def _qc():
    return QuantConfig(
        method=QMethod.symmetric_uniform,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        run_method=RunMethodConfig(),
    )


def _calibrate(model, x, seed=0):
    v = model.init(jax.random.key(seed), x[:1], ESTIMATE)
    _, ups = model.apply(v, x, ESTIMATE, mutable=["quant", "quant_est"])
    v = {**v, **ups}
    v = cache_quantized_weights(model, v, x, fast=True)
    vp, report = pack_dense_caches(v, model.qc)
    return strip_packed_params(vp), report


def _tree_sig(tree):
    return jax.tree_util.tree_map(
        lambda l: (getattr(l, "shape", None), str(getattr(l, "dtype", None))),
        tree)


def test_twin_structure_and_program_identical(rng):
    qc = _qc()
    big = QuantizedMobileNetV2(qc=qc, num_classes=16, input_size=96,
                               width_mult=0.25)
    twin = QuantizedMobileNetV2(qc=qc, num_classes=16, input_size=64,
                                width_mult=0.25)
    x_big = jnp.asarray(rng.normal(size=(2, 96, 96, 3)).astype(np.float32))
    x_small = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    # same init seed => same weights; calibration data differs (the twin
    # sees the small batch, the direct calibration the big one)
    v_twin, rep_twin = _calibrate(twin, x_small)
    v_direct, rep_direct = _calibrate(big, x_big)

    # (1) identical tree structure incl. every packed-cache key: the
    # data-dependent packing decisions (zp-key presence) come from the
    # weight quantizer state, which never sees the input
    assert _tree_sig(v_twin) == _tree_sig(v_direct)
    assert sorted(rep_twin) == sorted(rep_direct)

    # weight-derived state is bit-identical (pure function of the kernel)
    for leaf_t, leaf_d in zip(
            jax.tree_util.tree_leaves(v_twin.get("quant_cache", {})),
            jax.tree_util.tree_leaves(v_direct.get("quant_cache", {}))):
        np.testing.assert_array_equal(np.asarray(leaf_t), np.asarray(leaf_d))

    # (2) the timed serving program is the same compiled graph either way
    step = jax.jit(lambda v, x: big.apply(v, x, PACKED))
    hlo_twin = step.lower(v_twin, x_big).compile().as_text()
    hlo_direct = step.lower(v_direct, x_big).compile().as_text()
    assert hlo_twin == hlo_direct

    # (3) twin-calibrated variables drive the big model's serving phases
    for phase in (PACKED, CHAINED):
        y = np.asarray(big.apply(v_twin, x_big, phase))
        assert y.shape == (2, 16) and np.isfinite(y).all()
