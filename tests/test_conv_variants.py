"""1-D conv, transposed conv, and BN-linear layer variants.

Parity targets: the reference's ``QuantConv1d`` / ``QuantConvTranspose(1d)``
(with its per-channel weight-transposition trick, autoquant_utils.py:46-58) /
``BNQConv1d`` / ``BNQLinear`` (autoquant_utils.py:20-122), plus pure-math
equivalence against ``lax.conv_transpose`` and torch's transposed convs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from fp8_quantization_tpu.config import ApproxConfig, QuantConfig
from fp8_quantization_tpu.models.porting import (
    conv_transpose_kernel,
    conv_transpose_padding_from_torch,
)
from fp8_quantization_tpu.models.surgery import (
    Act,
    BatchNorm,
    ConvTranspose,
    Linear,
    QuantizedSequential,
    plan_sequential,
)
from fp8_quantization_tpu.ops.layers import (
    BNQuantDense,
    QuantConv,
    QuantConv1d,
    QuantConvTranspose,
    QuantConvTranspose1d,
    conv_patches,
)
from fp8_quantization_tpu.quant import ESTIMATE, FIXED, FP32

from tests.reference_loader import load_reference_quant_stack, reference_available
from tests.test_layer_parity import (
    RM_PLAIN,
    _calibrate_and_eval_ours,
    _calibrate_ref,
    _our_qc,
    _ref_qparams,
)

torch = pytest.importorskip("torch")


# --- pure-math checks (no reference needed) ---


def test_conv1d_matches_lax(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 5)).astype(np.float32))
    layer = QuantConv1d(qc=QuantConfig(), features=7, kernel_size=(3,),
                        strides=(2,), padding="SAME")
    v = layer.init(jax.random.key(0), x, ESTIMATE)
    y = layer.apply(v, x, FP32)
    ref = lax.conv_general_dilated(
        x, v["params"]["kernel"], (2,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + v["params"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("padding", ["SAME", "VALID"])
@pytest.mark.parametrize("strides", [(1, 1), (2, 2), (3, 3)])
def test_conv_transpose_matches_lax(rng, padding, strides):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    layer = QuantConvTranspose(qc=QuantConfig(), features=6, kernel_size=(3, 3),
                               strides=strides, padding=padding, use_bias=False)
    v = layer.init(jax.random.key(1), x, ESTIMATE)
    y = layer.apply(v, x, FP32)
    ref = lax.conv_transpose(
        x, v["params"]["kernel"], strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_conv_transpose_dilated_matches_lax(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    layer = QuantConvTranspose(qc=QuantConfig(), features=3, kernel_size=(3, 3),
                               strides=(2, 2), padding="SAME",
                               kernel_dilation=(2, 2), use_bias=False)
    v = layer.init(jax.random.key(2), x, ESTIMATE)
    y = layer.apply(v, x, FP32)
    ref = lax.conv_transpose(
        x, v["params"]["kernel"], (2, 2), "SAME", rhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_conv_transpose1d_matches_lax(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 5)).astype(np.float32))
    layer = QuantConvTranspose1d(qc=QuantConfig(), features=6, kernel_size=(4,),
                                 strides=(2,), padding="SAME", use_bias=False)
    v = layer.init(jax.random.key(3), x, ESTIMATE)
    y = layer.apply(v, x, FP32)
    ref = lax.conv_transpose(
        x, v["params"]["kernel"], (2,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_patches_with_input_dilation(rng):
    """The special-path im2col under input dilation reproduces the dilated
    correlation (the transposed-conv formulation the approx/qama paths use)."""
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))
    pads = ((2, 2), (2, 2))
    patches = conv_patches(x, w.shape, (1, 1), pads, (1, 1),
                           input_dilation=(2, 2))
    y = patches.reshape(-1, patches.shape[-1]) @ w.reshape(-1, 5)
    y = y.reshape(*patches.shape[:-1], 5)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), pads, lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize(
    "k,s,p,op,d",
    [((3, 3), (2, 2), (1, 1), (1, 1), (1, 1)),
     ((4, 4), (2, 2), (1, 1), (0, 0), (1, 1)),
     ((3, 3), (1, 1), (0, 0), (0, 0), (1, 1)),
     ((3, 3), (2, 2), (1, 1), (0, 0), (2, 2))],
)
def test_conv_transpose_matches_torch(rng, k, s, p, op, d):
    """Ported torch ConvTranspose2d weights + padding map reproduce
    F.conv_transpose2d exactly (quantization off)."""
    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    w = rng.normal(size=(4, 6, *k)).astype(np.float32)
    b = rng.normal(size=(6,)).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=s, padding=p, output_padding=op, dilation=d,
    ).numpy()

    pads = conv_transpose_padding_from_torch(k, s, p, op, d)
    layer = QuantConvTranspose(qc=QuantConfig(), features=6, kernel_size=k,
                               strides=s, padding=pads, kernel_dilation=d)
    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    v = layer.init(jax.random.key(0), xn, ESTIMATE)
    v = {**v, "params": {"kernel": conv_transpose_kernel(w),
                         "bias": jnp.asarray(b)}}
    y = np.transpose(np.asarray(layer.apply(v, xn, FP32)), (0, 3, 1, 2))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_surgery_plan_new_kinds():
    specs = (ConvTranspose(8, (3, 3), (2, 2)), Act("relu"),
             Linear(4), BatchNorm(), Act("relu"))
    plan = plan_sequential(specs)
    kinds = [p[0] for p in plan]
    assert kinds == ["convtranspose", "bnlinear"]
    assert plan[0][2] == "relu" and plan[1][2] == "relu"


def test_surgery_runs_new_kinds(rng):
    model = QuantizedSequential(
        qc=QuantConfig(),
        specs=(ConvTranspose(8, (3, 3), (2, 2)), Act("relu")),
    )
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    v = model.init(jax.random.key(0), x, ESTIMATE)
    y = model.apply(v, x, FIXED)
    assert y.shape == (1, 8, 8, 8)
    assert np.all(np.asarray(y) >= 0)


def test_special_path_conv_transpose(rng):
    """The armed qama/approx path on a transposed conv is finite and close to
    the plain product (the machinery is shared with QuantConv; this pins the
    input-dilated patches wiring)."""
    rm = {"approx_flag": True, "quantize_after_mult_and_add": False,
          "res_quantizer_flag": True, "original_quantize_res": True}
    layer = QuantConvTranspose(
        qc=_our_qc(rm, approx=ApproxConfig(with_approx=True, with_comp=True)),
        features=4, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
        use_bias=False,
    )
    batches = [rng.normal(size=(1, 5, 5, 3)).astype(np.float32)
               for _ in range(2)]
    eval_x = rng.normal(size=(1, 5, 5, 3)).astype(np.float32)
    y = _calibrate_and_eval_ours(layer, batches, eval_x)
    assert y.shape == (1, 10, 10, 4)
    assert np.all(np.isfinite(y))

    plain = QuantConvTranspose(
        qc=_our_qc(RM_PLAIN), features=4, kernel_size=(3, 3), strides=(2, 2),
        padding="SAME", use_bias=False,
    )
    v = plain.init(jax.random.key(0), jnp.asarray(batches[0]), ESTIMATE)
    layer_v = layer.init(jax.random.key(0), jnp.asarray(batches[0]), ESTIMATE)
    np.testing.assert_array_equal(
        np.asarray(v["params"]["kernel"]), np.asarray(layer_v["params"]["kernel"])
    )


# --- parity vs the reference hijacker stack ---

pytestmark_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def stack():
    if not reference_available():
        pytest.skip("reference checkout not present")
    return load_reference_quant_stack()


@pytestmark_ref
def test_quant_conv1d_parity(stack, rng):
    in_ch, out_ch, k = 4, 6, 3
    W = rng.normal(size=(out_ch, in_ch, k)).astype(np.float32)
    b = rng.normal(size=(out_ch,)).astype(np.float32)
    batches = [rng.normal(size=(2, in_ch, 12)).astype(np.float32)
               for _ in range(2)]
    eval_x = rng.normal(size=(2, in_ch, 12)).astype(np.float32)

    ref = stack.autoquant_utils.QuantConv1d(
        in_ch, out_ch, k, stride=2, padding=1, bias=True,
        **_ref_qparams(stack, RM_PLAIN),
    )
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(W))
        ref.bias.copy_(torch.from_numpy(b))
    _calibrate_ref(ref, batches)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(eval_x)).numpy()  # NCW

    layer = QuantConv1d(
        qc=_our_qc(RM_PLAIN), features=out_ch, kernel_size=(k,),
        strides=(2,), padding=[(1, 1)],
    )
    kernel = jnp.asarray(np.transpose(W, (2, 1, 0)))  # OIW -> WIO
    nwc = lambda t: np.transpose(t, (0, 2, 1))
    y_ours = _calibrate_and_eval_ours(
        layer, [nwc(t) for t in batches], nwc(eval_x),
        extra=[("kernel", kernel), ("bias", jnp.asarray(b))],
    )
    np.testing.assert_allclose(
        np.transpose(y_ours, (0, 2, 1)), y_ref, rtol=1e-4, atol=1e-5
    )


@pytestmark_ref
@pytest.mark.parametrize("per_channel", [True, False],
                         ids=["per-channel", "per-tensor"])
def test_quant_conv_transpose_parity(stack, rng, per_channel):
    """vs the reference's QuantConvTranspose — exercises its per-channel
    weight-transposition trick (autoquant_utils.py:46-58) against our
    channel-axis choice."""
    in_ch, out_ch, k = 4, 6, 3
    W = rng.normal(size=(in_ch, out_ch, k, k)).astype(np.float32)  # (I,O,kh,kw)
    b = rng.normal(size=(out_ch,)).astype(np.float32)
    batches = [rng.normal(size=(2, in_ch, 6, 6)).astype(np.float32)
               for _ in range(2)]
    eval_x = rng.normal(size=(2, in_ch, 6, 6)).astype(np.float32)

    ref = stack.autoquant_utils.QuantConvTranspose(
        in_ch, out_ch, k, stride=2, padding=1, output_padding=1, bias=True,
        **_ref_qparams(stack, RM_PLAIN, per_channel=per_channel),
    )
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(W))
        ref.bias.copy_(torch.from_numpy(b))
    _calibrate_ref(ref, batches)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(eval_x)).numpy()  # NCHW

    pads = conv_transpose_padding_from_torch((k, k), 2, 1, 1)
    layer = QuantConvTranspose(
        qc=_our_qc(RM_PLAIN, per_channel=per_channel), features=out_ch,
        kernel_size=(k, k), strides=(2, 2), padding=pads,
    )
    nhwc = lambda t: np.transpose(t, (0, 2, 3, 1))
    y_ours = _calibrate_and_eval_ours(
        layer, [nhwc(t) for t in batches], nhwc(eval_x),
        extra=[("kernel", conv_transpose_kernel(W)), ("bias", jnp.asarray(b))],
    )
    np.testing.assert_allclose(
        np.transpose(y_ours, (0, 3, 1, 2)), y_ref, rtol=1e-4, atol=1e-5
    )


@pytestmark_ref
def test_quant_conv_transpose1d_parity(stack, rng):
    in_ch, out_ch, k = 3, 5, 4
    W = rng.normal(size=(in_ch, out_ch, k)).astype(np.float32)  # (I,O,kw)
    batches = [rng.normal(size=(2, in_ch, 10)).astype(np.float32)
               for _ in range(2)]
    eval_x = rng.normal(size=(2, in_ch, 10)).astype(np.float32)

    ref = stack.autoquant_utils.QuantConvTranspose1d(
        in_ch, out_ch, k, stride=2, padding=1, bias=False,
        **_ref_qparams(stack, RM_PLAIN),
    )
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(W))
    _calibrate_ref(ref, batches)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(eval_x)).numpy()  # NCW

    pads = conv_transpose_padding_from_torch((k,), 2, 1)
    layer = QuantConvTranspose1d(
        qc=_our_qc(RM_PLAIN), features=out_ch, kernel_size=(k,),
        strides=(2,), padding=pads, use_bias=False,
    )
    nwc = lambda t: np.transpose(t, (0, 2, 1))
    y_ours = _calibrate_and_eval_ours(
        layer, [nwc(t) for t in batches], nwc(eval_x),
        extra=[("kernel", conv_transpose_kernel(W))],
    )
    np.testing.assert_allclose(
        np.transpose(y_ours, (0, 2, 1)), y_ref, rtol=1e-4, atol=1e-5
    )


@pytestmark_ref
def test_bnq_linear_parity(stack, rng):
    in_f, out_f = 10, 6
    W = rng.normal(size=(out_f, in_f)).astype(np.float32)
    gamma = (rng.normal(size=(out_f,)) * 0.2 + 1).astype(np.float32)
    beta = rng.normal(size=(out_f,)).astype(np.float32)
    mean = rng.normal(size=(out_f,)).astype(np.float32)
    var = np.abs(rng.normal(size=(out_f,)) + 1).astype(np.float32)
    batches = [rng.normal(size=(4, in_f)).astype(np.float32) for _ in range(2)]
    eval_x = rng.normal(size=(5, in_f)).astype(np.float32)

    ref = stack.autoquant_utils.BNQLinear(
        in_f, out_f, **_ref_qparams(stack, RM_PLAIN),
    )
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(W))
        ref.gamma.copy_(torch.from_numpy(gamma))
        ref.beta.copy_(torch.from_numpy(beta))
        ref.running_mean.copy_(torch.from_numpy(mean))
        ref.running_var.copy_(torch.from_numpy(var))
    _calibrate_ref(ref, batches)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(eval_x)).numpy()

    layer = BNQuantDense(qc=_our_qc(RM_PLAIN), features=out_f, use_bias=False)
    variables = layer.init(jax.random.key(0), jnp.asarray(batches[0]), ESTIMATE)
    variables = {
        "params": {"kernel": jnp.asarray(W.T), "gamma": jnp.asarray(gamma),
                   "beta": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    for b in batches:
        _, ups = layer.apply(
            variables, jnp.asarray(b), ESTIMATE, mutable=["quant", "quant_est"]
        )
        variables = {**variables, **ups}
    y_ours = np.asarray(layer.apply(variables, jnp.asarray(eval_x), FIXED))
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-5)


@pytestmark_ref
def test_bnq_conv1d_parity(stack, rng):
    from fp8_quantization_tpu.ops.layers import BNQuantConv

    in_ch, out_ch, k = 3, 5, 3
    W = rng.normal(size=(out_ch, in_ch, k)).astype(np.float32)
    gamma = (rng.normal(size=(out_ch,)) * 0.2 + 1).astype(np.float32)
    beta = rng.normal(size=(out_ch,)).astype(np.float32)
    mean = rng.normal(size=(out_ch,)).astype(np.float32)
    var = np.abs(rng.normal(size=(out_ch,)) + 1).astype(np.float32)
    batches = [rng.normal(size=(2, in_ch, 12)).astype(np.float32)
               for _ in range(2)]
    eval_x = rng.normal(size=(2, in_ch, 12)).astype(np.float32)

    ref = stack.autoquant_utils.BNQConv1d(
        in_ch, out_ch, k, stride=1, padding=1,
        **_ref_qparams(stack, RM_PLAIN),
    )
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(W))
        ref.gamma.copy_(torch.from_numpy(gamma))
        ref.beta.copy_(torch.from_numpy(beta))
        ref.running_mean.copy_(torch.from_numpy(mean))
        ref.running_var.copy_(torch.from_numpy(var))
    _calibrate_ref(ref, batches)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(eval_x)).numpy()  # NCW

    layer = BNQuantConv(
        qc=_our_qc(RM_PLAIN), features=out_ch, kernel_size=(k,),
        strides=(1,), padding=[(1, 1)], use_bias=False,
    )
    kernel = jnp.asarray(np.transpose(W, (2, 1, 0)))
    nwc = lambda t: np.transpose(t, (0, 2, 1))
    variables = layer.init(
        jax.random.key(0), jnp.asarray(nwc(batches[0])), ESTIMATE
    )
    variables = {
        "params": {"kernel": kernel, "gamma": jnp.asarray(gamma),
                   "beta": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    for b in batches:
        _, ups = layer.apply(
            variables, jnp.asarray(nwc(b)), ESTIMATE,
            mutable=["quant", "quant_est"],
        )
        variables = {**variables, **ups}
    y_ours = np.asarray(layer.apply(variables, jnp.asarray(nwc(eval_x)), FIXED))
    np.testing.assert_allclose(
        np.transpose(y_ours, (0, 2, 1)), y_ref, rtol=1e-4, atol=1e-5
    )
