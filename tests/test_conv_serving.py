"""Native int8 / packed-byte serving paths for CONVOLUTIONS (VERDICT r2 #3).

The reference's flagship models are CNNs
(`/root/reference/models/mobilenet_v2_quantized.py:15-27`,
`resnet_quantized.py:14-47`); round 2 only gave dense layers real-storage
paths. These tests pin the conv equivalents:

* int8 conv: activation codes x frozen int8 kernel codes accumulate in int32
  (``fastpath.quantized_conv_int8``) — matches the simulated fast path.
* packed-FP8 conv: 1-byte ExMy kernel codes decoded by XLA bit-ops — matches
  the fast path bit-for-bit on exactly-packable channels.
* unsigned/asymmetric act codes (cx != 0 — every ReLU-fed site) stay exact:
  padding and input dilation fill with the cx code via ``lax.pad``.
* MobileNetV2 / ResNet18 end-to-end: PACKED == FAST logits.
"""

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
from fp8_quantization_tpu.eval import cache_quantized_weights
from fp8_quantization_tpu.ops.fastpath import (
    pack_dense_caches,
    strip_packed_params,
)
from fp8_quantization_tpu.ops.layers import (
    BNQuantConv,
    QuantConv,
    QuantConvTranspose,
)
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.sites import CHAINED, FAST, PACKED, QuantPhase


def _int8_qc(n_bits=8, res=True):
    return QuantConfig(
        method=QMethod.symmetric_uniform,
        n_bits=n_bits,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        run_method=RunMethodConfig(res_quantizer_flag=res),
    )


def _fp8_qc():
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


def _prepare(model, x, qc):
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    _, ups = model.apply(variables, x, ESTIMATE,
                         mutable=["quant", "quant_est"])
    variables = {**variables, **ups}
    variables = cache_quantized_weights(model, variables, x, fast=True)
    packed, report = pack_dense_caches(variables, qc)
    packed = strip_packed_params(packed)
    return variables, packed, report


def _kernels_stripped(tree):
    if not isinstance(tree, dict):
        return True
    return all(_kernels_stripped(v) for k, v in tree.items()
               if k != "kernel") and "kernel" not in tree


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))


@pytest.mark.parametrize("layer_kw", [
    dict(features=8, kernel_size=(3, 3)),
    dict(features=8, kernel_size=(3, 3), strides=(2, 2), padding="VALID"),
    dict(features=6, kernel_size=(3, 3), feature_group_count=6),  # depthwise
    dict(features=8, kernel_size=(3, 3), feature_group_count=2),
])
def test_int8_conv_matches_simulation(layer_kw, x):
    qc = _int8_qc()
    model = QuantConv(qc=qc, **layer_kw)
    variables, packed, report = _prepare(model, x, qc)
    assert list(report.values()) == [1.0]
    y_fast = np.asarray(model.apply(variables, x, FAST))
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    np.testing.assert_allclose(y_pack, y_fast, rtol=2e-5, atol=2e-5)
    # the f32 kernel is gone: the int8 codes really served the conv
    assert _kernels_stripped(packed.get("params", {}))


def test_int8_bn_conv_matches_simulation(x):
    qc = _int8_qc()
    model = BNQuantConv(qc=qc, features=8, kernel_size=(3, 3))
    variables, packed, _ = _prepare(model, x, qc)
    y_fast = np.asarray(model.apply(variables, x, FAST))
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    np.testing.assert_allclose(y_pack, y_fast, rtol=2e-5, atol=2e-5)


def test_int8_conv_transpose_matches_simulation(x):
    qc = _int8_qc()
    model = QuantConvTranspose(qc=qc, features=8, kernel_size=(3, 3),
                               strides=(2, 2))
    variables, packed, _ = _prepare(model, x, qc)
    y_fast = np.asarray(model.apply(variables, x, FAST))
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    np.testing.assert_allclose(y_pack, y_fast, rtol=2e-5, atol=2e-5)


def test_int4_conv_matches_simulation(x):
    qc = _int8_qc(n_bits=4)
    model = QuantConv(qc=qc, features=8, kernel_size=(3, 3))
    variables, packed, report = _prepare(model, x, qc)
    assert list(report.values()) == [1.0]
    y_fast = np.asarray(model.apply(variables, x, FAST))
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    np.testing.assert_allclose(y_pack, y_fast, rtol=2e-5, atol=2e-5)


def test_asymmetric_acts_int8_conv(x):
    """Asymmetric act codes have cx != 0 — padding/dilation fill with the cx
    code keeps every padded tap exactly zero-valued, so the asymmetric
    config serves natively too."""
    qc = QuantConfig(
        method=QMethod.asymmetric_uniform,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
    )
    model = QuantConv(qc=qc, features=8, kernel_size=(3, 3))
    variables, packed, report = _prepare(model, x, qc)
    assert len(report) == 1
    assert _kernels_stripped(packed.get("params", {}))
    y_fast = np.asarray(model.apply(variables, x, FAST))
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    np.testing.assert_allclose(y_pack, y_fast, rtol=2e-5, atol=2e-5)


def test_relu_fed_unsigned_site_chain(rng):
    """Two stacked BN convs: the second conv's act site calibrates UNSIGNED
    (ReLU-fed) so its codes carry cx = -128 — the r3 bug class where zero
    padding decoded as -128*scale. Must match the simulation."""
    import flax.linen as fnn

    qc = _int8_qc()

    class TwoConv(fnn.Module):
        qc: QuantConfig

        @fnn.compact
        def __call__(self, x, qp):
            y = BNQuantConv(qc=self.qc, features=6, kernel_size=(3, 3),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            activation=fnn.relu, name="conv1")(x, qp)
            return BNQuantConv(qc=self.qc, features=6, kernel_size=(3, 3),
                               padding=[(1, 1), (1, 1)], use_bias=False,
                               name="conv2")(y, qp)

    model = TwoConv(qc=qc)
    xx = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    variables, packed, _ = _prepare(model, xx, qc)
    y_fast = np.asarray(model.apply(variables, xx, FAST))
    y_pack = np.asarray(model.apply(packed, xx, PACKED))
    np.testing.assert_allclose(y_pack, y_fast, rtol=2e-5, atol=2e-5)


def test_packed_fp8_conv_weights(x):
    """1-byte ExMy conv kernels: bit-exact vs fast mode on channels the
    packing reports exact (the STE-bias-overflow channels re-quantize onto
    the bias-1 grid, same contract as dense packing)."""
    qc = _fp8_qc()
    model = QuantConv(qc=qc, features=8, kernel_size=(3, 3))
    variables, packed, report = _prepare(model, x, qc)
    assert len(report) == 1
    y_fast = np.asarray(model.apply(variables, x, FAST))
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    assert _kernels_stripped(packed.get("params", {}))
    if list(report.values()) == [1.0]:
        np.testing.assert_array_equal(y_pack, y_fast)
    else:
        np.testing.assert_allclose(y_pack, y_fast, rtol=2e-2, atol=2e-2)


def test_mobilenet_int8_e2e(rng):
    from fp8_quantization_tpu.models.mobilenet_v2 import QuantizedMobileNetV2

    qc = _int8_qc()
    model = QuantizedMobileNetV2(qc=qc, num_classes=13, input_size=32,
                                 width_mult=0.25)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables, packed, report = _prepare(model, x, qc)
    assert len(report) > 10  # convs AND the classifier packed
    y_fast = np.asarray(model.apply(variables, x, FAST))
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    np.testing.assert_allclose(y_pack, y_fast, rtol=5e-4, atol=5e-4)
    # chained = the FUSED-boundary serving mode (quant.sites.Affine): equal
    # to the unfused int8 path up to f32 constant-folding ULPs — i.e. at
    # most a grid step at a handful of round boundaries, never a ranking
    # change on these scales
    y_chained = np.asarray(model.apply(packed, x, CHAINED))
    np.testing.assert_allclose(y_chained, y_pack, rtol=5e-4, atol=5e-4)
    assert (y_chained.argmax(-1) == y_pack.argmax(-1)).all()


def test_resnet18_int8_e2e(rng):
    from fp8_quantization_tpu.models.resnet import QuantizedResNet

    qc = _int8_qc()
    model = QuantizedResNet(qc=qc, depth=18, num_classes=13)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables, packed, report = _prepare(model, x, qc)
    assert len(report) > 10
    y_fast = np.asarray(model.apply(variables, x, FAST))
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    np.testing.assert_allclose(y_pack, y_fast, rtol=5e-4, atol=5e-4)
    y_chained = np.asarray(model.apply(packed, x, CHAINED))
    np.testing.assert_allclose(y_chained, y_pack, rtol=5e-4, atol=5e-4)
    assert (y_chained.argmax(-1) == y_pack.argmax(-1)).all()


def test_transpose_conv_unsigned_acts_int8(rng):
    """Transposed conv with an UNSIGNED act site (cx = -128): the interior
    input-dilation zeros AND edge padding must fill with the cx code (via
    lax.pad's interior padding) or every inserted tap decodes to
    -128*scale instead of 0."""
    import flax.linen as fnn

    qc = _int8_qc()

    class ReluThenTranspose(fnn.Module):
        qc: QuantConfig

        @fnn.compact
        def __call__(self, x, qp):
            y = BNQuantConv(qc=self.qc, features=6, kernel_size=(3, 3),
                            use_bias=False, activation=fnn.relu,
                            name="conv")(x, qp)
            return QuantConvTranspose(qc=self.qc, features=4,
                                      kernel_size=(3, 3), strides=(2, 2),
                                      name="up")(y, qp)

    model = ReluThenTranspose(qc=qc)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    variables, packed, report = _prepare(model, x, qc)
    assert len(report) == 2
    y_fast = np.asarray(model.apply(variables, x, FAST))
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    np.testing.assert_allclose(y_pack, y_fast, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Fused-boundary algebra (quant.sites.Affine, VERDICT r3 next #1)
# ---------------------------------------------------------------------------

def test_fold_quantize_affine_exact_po2(rng):
    """With power-of-two constants every product/quotient is exact in f32,
    so the folded one-mul-add-round-clip must equal the sequential
    materialize-then-quantize BIT-FOR-BIT (incl. the clamp merged into
    integer bounds)."""
    from fp8_quantization_tpu.quant.sites import (
        Affine, decoded, fold_quantize_affine)

    x = jnp.asarray(rng.integers(-1000, 1000, size=(64, 32)), jnp.float32)
    scale = jnp.asarray(2.0 ** rng.integers(-8, -2, size=(32,)), jnp.float32)
    bias = jnp.asarray(
        rng.integers(-64, 64, size=(32,)) * 0.125, jnp.float32)
    s, zp = jnp.float32(2.0 ** -4), jnp.float32(13.0)
    lo_i, hi_i = jnp.float32(0.0), jnp.float32(255.0)

    for lo, hi in [(None, None), (0.0, 6.0), (0.0, None)]:
        aff = Affine(x, scale, bias,
                     None if lo is None else jnp.float32(lo),
                     None if hi is None else jnp.float32(hi))
        got = np.asarray(fold_quantize_affine(aff, s, zp, lo_i, hi_i))
        v = np.asarray(decoded(aff))
        want = np.clip(np.round(v / float(s)) + float(zp), float(lo_i),
                       float(hi_i))
        np.testing.assert_array_equal(got, want)


def test_affine_compose_exact_po2(rng):
    """then_affine / with_clamp compose exactly (po2 constants): decoding
    the composed Affine == applying the stages sequentially."""
    from fp8_quantization_tpu.quant.sites import Affine, decoded

    x = jnp.asarray(rng.integers(-500, 500, size=(16, 8)), jnp.float32)
    s1 = jnp.asarray(2.0 ** rng.integers(-6, -2, size=(8,)), jnp.float32)
    b1 = jnp.asarray(rng.integers(-16, 16, size=(8,)) * 0.25, jnp.float32)
    s2 = jnp.asarray(2.0 ** rng.integers(-2, 3, size=(8,)), jnp.float32)
    b2 = jnp.asarray(rng.integers(-8, 8, size=(8,)) * 0.5, jnp.float32)

    aff = Affine(x, s1, b1).then_affine(s2, b2).with_clamp(0.0, 6.0)
    got = np.asarray(decoded(aff))
    want = np.clip((np.asarray(x) * np.asarray(s1) + np.asarray(b1))
                   * np.asarray(s2) + np.asarray(b2), 0.0, 6.0)
    np.testing.assert_array_equal(got, want)


def test_chained_fused_boundary_exact_po2(rng):
    """Two stacked BN convs with every scale/stat forced to a power of two:
    the fused-boundary CHAINED apply must equal the unfused PACKED apply
    BIT-FOR-BIT (all constant folds exact -> identical rounds)."""
    import flax
    import flax.linen as fnn

    from fp8_quantization_tpu.ops.activations import relu6

    qc = _int8_qc()

    class TwoConv(fnn.Module):
        qc: QuantConfig

        @fnn.compact
        def __call__(self, x, qp):
            y = BNQuantConv(qc=self.qc, features=8, kernel_size=(3, 3),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            activation=relu6, name="conv1")(x, qp)
            y = BNQuantConv(qc=self.qc, features=8, kernel_size=(3, 3),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            activation=fnn.relu, name="conv2")(y, qp)
            from fp8_quantization_tpu.quant.sites import decoded as _dec

            return _dec(y)

    def po2ize(tree):
        def fix(path, v):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            v = np.asarray(v)
            if name in ("delta",):
                return jnp.asarray(2.0 ** np.floor(np.log2(np.abs(v) + 1e-30)),
                                   jnp.float32)
            if name in ("gamma", "mean"):
                return jnp.asarray(
                    np.sign(v) * 2.0 ** np.round(np.log2(np.abs(v) + 2e-2)),
                    jnp.float32)
            if name == "beta":
                return jnp.asarray(np.round(v * 8) / 8.0, jnp.float32)
            if name == "var":
                # var + bn_eps exactly a power of two
                return jnp.asarray(
                    2.0 ** np.round(np.log2(v + 1e-5)) - 1e-5, jnp.float32)
            return jnp.asarray(v)

        return jax.tree_util.tree_map_with_path(fix, tree)

    model = TwoConv(qc=qc)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    _, ups = model.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    v = {**variables, **ups}
    v = flax.core.unfreeze(v)
    v["quant"] = po2ize(v["quant"])
    v["batch_stats"] = po2ize(v["batch_stats"])
    cache_qp = QuantPhase(phase="fixed", cache_weights=True)
    _, ups = model.apply(v, x, cache_qp, mutable=["quant_cache"])
    v = {**v, **ups}
    packed, _ = pack_dense_caches(v, qc)

    y_pack = np.asarray(model.apply(packed, x, PACKED))
    y_chained = np.asarray(model.apply(packed, x, CHAINED))
    np.testing.assert_array_equal(y_chained, y_pack)


def test_fused_boundary_prediction_agreement(rng):
    """Accuracy guard for the fused boundary: over a 64-sample synthetic
    batch the CHAINED (fused) MobileNetV2 must predict the same classes as
    the unfused PACKED path — the +-1-ULP constant-folding deviations may
    move individual logits by a grid step but must not move decisions on
    non-degenerate inputs."""
    from fp8_quantization_tpu.models.mobilenet_v2 import QuantizedMobileNetV2

    qc = _int8_qc(res=False)  # reference-default serving config
    model = QuantizedMobileNetV2(qc=qc, num_classes=13, input_size=32,
                                 width_mult=0.25)
    x = jnp.asarray(rng.normal(size=(64, 32, 32, 3)).astype(np.float32))
    _, packed, _ = _prepare(model, x[:4], qc)
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    y_chained = np.asarray(model.apply(packed, x, CHAINED))
    agree = y_pack.argmax(-1) == y_chained.argmax(-1)
    assert agree.mean() >= 0.9, agree.mean()
    # any flip must be a near-tie: the top1-top2 gap of the unfused logits
    # within the fused path's numerical deviation budget (random-weight
    # logits are near-degenerate, so exact ties do occur on synthetic data)
    dev = np.abs(y_pack - y_chained).max()
    for i in np.flatnonzero(~agree):
        top2 = np.sort(y_pack[i])[-2:]
        assert top2[1] - top2[0] <= 4 * dev, (i, top2, dev)


def test_fp8_chained_fused_boundary_exact_po2(rng):
    """FP8 analog of the uniform po2 fused-boundary test (VERDICT r4 next
    #6): two stacked BN convs under the FP quantizer with every maxval/stat
    forced to a power of two — the CHAINED apply (BN rides out as a pending
    Affine, clamp + next act site fold into one FP8 clip) must equal the
    unfused PACKED apply BIT-FOR-BIT (po2 constants make the BN distribute
    exact, and the clip merge is exact unconditionally)."""
    import flax
    import flax.linen as fnn

    import jax as _jax
    from fp8_quantization_tpu.ops.activations import relu6

    qc = _fp8_qc()

    class TwoConv(fnn.Module):
        qc: QuantConfig

        @fnn.compact
        def __call__(self, x, qp):
            y = BNQuantConv(qc=self.qc, features=8, kernel_size=(3, 3),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            activation=relu6, name="conv1")(x, qp)
            y = BNQuantConv(qc=self.qc, features=8, kernel_size=(3, 3),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            activation=fnn.relu, name="conv2")(y, qp)
            from fp8_quantization_tpu.quant.sites import decoded as _dec

            return _dec(y)

    def po2ize(tree):
        def fix(path, v):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            v = np.asarray(v)
            if name == "maxval":
                return jnp.asarray(2.0 ** np.ceil(np.log2(np.abs(v) + 1e-30)),
                                   jnp.float32)
            if name in ("gamma", "mean"):
                return jnp.asarray(
                    np.sign(v) * 2.0 ** np.round(np.log2(np.abs(v) + 2e-2)),
                    jnp.float32)
            if name == "beta":
                return jnp.asarray(np.round(v * 8) / 8.0, jnp.float32)
            if name == "var":
                return jnp.asarray(
                    2.0 ** np.round(np.log2(v + 1e-5)) - 1e-5, jnp.float32)
            return jnp.asarray(v)

        return _jax.tree_util.tree_map_with_path(fix, tree)

    model = TwoConv(qc=qc)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    _, ups = model.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    v = {**variables, **ups}
    v = flax.core.unfreeze(v)
    v["quant"] = po2ize(v["quant"])
    v["batch_stats"] = po2ize(v["batch_stats"])
    cache_qp = QuantPhase(phase="fixed", cache_weights=True)
    _, ups = model.apply(v, x, cache_qp, mutable=["quant_cache"])
    v = {**v, **ups}
    packed, _ = pack_dense_caches(v, qc)

    y_pack = np.asarray(model.apply(packed, x, PACKED))
    y_chained = np.asarray(model.apply(packed, x, CHAINED))
    np.testing.assert_array_equal(y_chained, y_pack)


def test_mobilenet_fp8_chained_e2e(rng):
    """MobileNetV2 under the canonical FP8 config (the reference's
    scripts/image_net.sh flag family): CHAINED (BN/clamp ride pending
    Affines into the FP8 act-site clip) must track the unfused PACKED path
    within the fused-boundary deviation budget and agree on predictions."""
    from fp8_quantization_tpu.models.mobilenet_v2 import QuantizedMobileNetV2

    qc = _fp8_qc()
    model = QuantizedMobileNetV2(qc=qc, num_classes=13, input_size=32,
                                 width_mult=0.25)
    x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)).astype(np.float32))
    _, packed, _ = _prepare(model, x[:4], qc)
    y_pack = np.asarray(model.apply(packed, x, PACKED))
    y_chained = np.asarray(model.apply(packed, x, CHAINED))
    np.testing.assert_allclose(y_chained, y_pack, rtol=5e-3, atol=5e-3)
    agree = y_pack.argmax(-1) == y_chained.argmax(-1)
    assert agree.mean() >= 0.9, agree.mean()
    dev = np.abs(y_pack - y_chained).max()
    for i in np.flatnonzero(~agree):
        top2 = np.sort(y_pack[i])[-2:]
        assert top2[1] - top2[0] <= 4 * dev, (i, top2, dev)
