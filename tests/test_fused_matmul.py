"""Fused Pallas quantize->matmul->requantize kernel vs the jnp golden path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.numerics import quantize_to_fp8_ste
from fp8_quantization_tpu.ops.pallas import (
    fused_quant_matmul,
    quantize_block,
    quantize_weights_bf16,
)


def _params(x, mant=4, n_bits=8, sign=1):
    maxval = float(jnp.max(jnp.abs(x)))
    _, bias = quantize_to_fp8_ste(x, n_bits, jnp.asarray([maxval]),
                                  float(mant), sign)
    return maxval, int(bias[0]), mant, sign


class TestQuantizeBlock:
    @pytest.mark.parametrize("mant,sign", [(4, 1), (3, 1), (2, 1), (4, 0)])
    def test_bitexact_vs_ste(self, mant, sign, rng):
        """The bit-ops quantizer must equal the frexp/ldexp STE quantizer."""
        x = jnp.asarray((rng.normal(size=(256, 128)) * 3).astype(np.float32))
        maxval, bias, _, _ = _params(x, mant=mant, sign=sign)
        ref, _ = quantize_to_fp8_ste(x, 8, jnp.asarray([maxval]), float(mant), sign)
        ours = quantize_block(x, jnp.float32(maxval), jnp.int32(bias),
                              jnp.int32(mant), jnp.int32(sign))
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_zeros_and_extremes(self):
        x = jnp.asarray([0.0, -0.0, 1e-30, -1e-30, 1e6, -1e6], jnp.float32)
        q = quantize_block(x, jnp.float32(3.0), jnp.int32(7), jnp.int32(4),
                           jnp.int32(1))
        assert float(q[0]) == 0.0 and float(q[1]) == 0.0
        assert float(q[4]) == 3.0 and float(q[5]) == -3.0

    def test_bf16_cast_exact(self, rng):
        """Grid values must survive the bf16 cast exactly (mant<=7)."""
        for mant in (2, 3, 4, 5):
            x = jnp.asarray((rng.normal(size=(1024,)) * 2).astype(np.float32))
            q, _ = quantize_to_fp8_ste(x, 8, jnp.asarray([2.5]), float(mant), 1)
            np.testing.assert_array_equal(
                np.asarray(quantize_weights_bf16(q).astype(jnp.float32)),
                np.asarray(q),
            )


class TestFusedMatmul:
    def test_matches_golden(self, rng):
        m, k, n = 200, 300, 170  # deliberately unaligned (padding path)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
        ap = _params(x)
        wq, _ = quantize_to_fp8_ste(w, 8, jnp.max(jnp.abs(w), axis=0, keepdims=True), 4.0, 1)

        golden_xq, _ = quantize_to_fp8_ste(
            x, 8, jnp.asarray([ap[0]]), 4.0, 1
        )
        golden = golden_xq @ wq

        out = fused_quant_matmul(
            x, quantize_weights_bf16(wq), act_params=ap,
            bm=128, bn=128, bk=128,
        )
        assert out.shape == (m, n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                                   rtol=1e-5, atol=1e-5)

    def test_requantize_epilogue(self, rng):
        m, k, n = 128, 128, 128
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
        ap = _params(x)
        wq, _ = quantize_to_fp8_ste(w, 8, jnp.max(jnp.abs(w), axis=0, keepdims=True), 4.0, 1)

        golden_xq, _ = quantize_to_fp8_ste(x, 8, jnp.asarray([ap[0]]), 4.0, 1)
        pre = golden_xq @ wq
        rp = _params(pre)
        golden, _ = quantize_to_fp8_ste(pre, 8, jnp.asarray([rp[0]]), 4.0, 1)

        out = fused_quant_matmul(
            x, quantize_weights_bf16(wq), act_params=ap, res_params=rp,
            requantize_out=True, bm=128, bn=128, bk=128,
        )
        # epilogue requant sees bit-identical accumulator sums only when the
        # reduction order matches; allow one grid step of slack
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                                   rtol=2**-3, atol=1e-4)
        exact = np.mean(np.asarray(out) == np.asarray(golden))
        assert exact > 0.99

    def test_no_quantize_passthrough(self, rng):
        m, k, n = 128, 256, 128
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        wq = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
        wq, _ = quantize_to_fp8_ste(wq, 8, jnp.max(jnp.abs(wq), axis=0, keepdims=True), 4.0, 1)
        out = fused_quant_matmul(
            x.astype(jnp.float32), quantize_weights_bf16(wq),
            quantize_x=False, bm=128, bn=128, bk=128,
        )
        golden = x.astype(jnp.bfloat16).astype(jnp.float32) @ wq
        np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                                   rtol=1e-2, atol=1e-2)
