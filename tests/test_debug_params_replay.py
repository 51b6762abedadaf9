"""Replay the reference's captured ``debug_params/`` layer tensors.

The reference ships CSVs of one real quantized layer's im2col'd activations
(784x144, FP8 E3M4 grid at bias 5), weight matrix (144x32, per-channel biases
9/10) and the FP biases themselves, dumped by the (commented) capture code at
``approx_calculation.py:881-902`` — free, committed test vectors for offline
kernel replay (SURVEY.md §4). These tests replay them through our codec, the
golden approx matmul vs the reference implementation, and the fused Pallas
kernel.
"""

import os

import numpy as np
import pytest

from tests.reference_loader import (
    REFERENCE_ROOT,
    load_reference_module,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

EW, MW = 3, 4       # E3M4, the reference's canonical format
RES_BIAS = 4        # default result bias 2^(EW-1) (approx_calculation.py:605)


@pytest.fixture(scope="module")
def captured():
    d = os.path.join(REFERENCE_ROOT, "debug_params")
    act = np.loadtxt(os.path.join(d, "act.csv"), delimiter=",",
                     dtype=np.float32)
    weight = np.loadtxt(os.path.join(d, "weight.csv"), delimiter=",",
                        dtype=np.float32)
    act_bias = int(np.loadtxt(os.path.join(d, "act_bias.csv")))
    weight_bias = np.loadtxt(os.path.join(d, "weight_bias.csv"),
                             dtype=np.float32).astype(np.int32)
    assert act.shape == (784, 144) and weight.shape == (144, 32)
    assert weight_bias.shape == (32,)
    return act, weight, act_bias, weight_bias


@pytest.fixture(scope="module")
def ref_v9():
    return load_reference_module(
        "approx/approx_matmul_whole_v9.py", "_ref_v9_replay"
    )


def test_captured_tensors_vs_codec_grid(captured):
    """The captured tensors came through the reference's STE quantizer, whose
    rounding convention carries across binades; the ExMy codec clamps at
    binade tops (the two documented conventions — CLAUDE.md numerics
    invariants). On real data they agree everywhere except the rare
    binade-top carries, and the codec is idempotent on its own grid."""
    from fp8_quantization_tpu.numerics import quantize_exmy

    act, weight, act_bias, weight_bias = captured
    rt = np.asarray(quantize_exmy(act, EW, MW, act_bias))
    # convention difference touches only a sliver of values...
    assert (rt != act).mean() < 0.005
    # ...and each such value moves by at most one mantissa step
    step = np.abs(rt - act).max()
    assert step <= 2.0 ** (1 - act_bias - MW) * (2 ** MW)
    # codec idempotency on the codec's own grid
    np.testing.assert_array_equal(
        np.asarray(quantize_exmy(rt, EW, MW, act_bias)), rt)
    for j, bj in enumerate(weight_bias):
        wq = np.asarray(quantize_exmy(weight[:, j], EW, MW, int(bj)))
        np.testing.assert_array_equal(
            np.asarray(quantize_exmy(wq, EW, MW, int(bj))), wq)


def test_captured_encode_decode_roundtrip(captured):
    """float -> (expo, mant, sign) -> float is the identity on the captured
    activations snapped to the codec grid (incl. subnormals and zeros)."""
    from fp8_quantization_tpu.numerics import quantize_exmy
    from fp8_quantization_tpu.numerics.codec import compose, decompose

    act, _, act_bias, _ = captured
    actg = jnp.asarray(quantize_exmy(act, EW, MW, act_bias))
    expo, mant = decompose(actg, MW, act_bias, expo_width=EW, clip_of=True)
    sign = jnp.where(actg < 0, -1.0, 1.0)
    back = np.asarray(compose(expo, mant, MW, act_bias, sign=sign))
    np.testing.assert_array_equal(back, np.asarray(actg))


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(with_approx=True, with_comp=True, quant_btw_mult_accu=True),
        dict(with_approx=True, with_comp=False, quant_btw_mult_accu=True),
        dict(with_approx=False, with_comp=True, quant_btw_mult_accu=False),
    ],
    ids=["approx-comp", "approx-nocomp", "golden-path"],
)
def test_layer_replay_matches_reference(captured, ref_v9, kwargs):
    """Full-layer replay: our vectorized golden matmul on the captured
    tensors == the reference kernel looped per output channel exactly as
    ``approx_calculation.py:946-971`` runs it."""
    from fp8_quantization_tpu.numerics import (
        approx_matmul_golden,
        get_error_table,
    )

    act, weight, act_bias, weight_bias = captured
    # subsample rows to keep the per-channel reference loop fast; columns
    # keep every distinct weight bias
    act = act[:98]
    table = get_error_table(EW, MW, kwargs["with_comp"], 3)

    ref_cols = []
    for j in range(weight.shape[1]):
        ref_cols.append(
            ref_v9.custom_matmul_vectorize(
                torch.from_numpy(act),
                torch.from_numpy(weight[:, j: j + 1]),
                EW, MW, act_bias, int(weight_bias[j]), RES_BIAS,
                torch.from_numpy(np.asarray(table)),
                with_approx=kwargs["with_approx"],
                quant_btw_mult_accu=kwargs["quant_btw_mult_accu"],
            ).numpy()[:, 0]
        )
    ref = np.stack(ref_cols, axis=1)

    ours = np.asarray(approx_matmul_golden(
        act, weight, EW, MW, act_bias,
        jnp.asarray(weight_bias), RES_BIAS, table,
        with_approx=kwargs["with_approx"],
        quant_btw_mult_accu=kwargs["quant_btw_mult_accu"],
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_pallas_kernel_replay(captured):
    """The fused Pallas kernel reproduces the golden oracle bit-for-bit on
    the real captured layer (true production shapes, per-channel biases)."""
    from fp8_quantization_tpu.numerics import (
        approx_matmul_golden,
        get_error_table,
    )
    from fp8_quantization_tpu.ops.pallas.approx_matmul import (
        approx_matmul_pallas,
    )

    act, weight, act_bias, weight_bias = captured
    table = get_error_table(EW, MW, True, 3)
    golden = np.asarray(approx_matmul_golden(
        act, weight, EW, MW, act_bias,
        jnp.asarray(weight_bias), RES_BIAS, table,
    ))
    ours = np.asarray(approx_matmul_pallas(
        jnp.asarray(act), jnp.asarray(weight),
        act_bias, jnp.asarray(weight_bias), RES_BIAS,
        expo_width=EW, mant_width=MW, with_comp=True, dnsmp_factor=3,
        bm=16, bn=16, bk=16,
    ))
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-6)
