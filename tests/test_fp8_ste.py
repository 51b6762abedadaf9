"""FP8 STE quantizer tests: grid idempotency, STE gradients, bias math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.numerics import (
    default_maxval,
    fp8_grid,
    fp8_max_value,
    quantize_to_fp8_ste,
)


def test_grid_max_value_consistency():
    for ebits, bias in [(4, 8), (3, 4), (5, 16)]:
        grid = fp8_grid(8, ebits, bias)
        assert np.max(np.abs(grid)) == pytest.approx(fp8_max_value(ebits, bias))


@pytest.mark.parametrize("mant_bits", [2, 3, 4, 5])
def test_idempotent_on_own_grid(mant_bits):
    """Quantizing the FP8 value space must be a fixed point (reference test.py:57-71)."""
    n_bits = 8
    ebits = n_bits - 1 - mant_bits
    default_bias = 2 ** (ebits - 1)
    grid = fp8_grid(n_bits, ebits, default_bias).astype(np.float32)
    maxval = jnp.asarray([np.max(np.abs(grid))])
    q, _bias = quantize_to_fp8_ste(jnp.asarray(grid), n_bits, maxval, float(mant_bits), 1)
    np.testing.assert_allclose(np.asarray(q), grid, rtol=0, atol=0)


def test_default_maxval_matches_grid():
    for mant in [2, 3, 4]:
        ebits = 8 - mant - 1
        assert default_maxval(8, mant) == pytest.approx(
            fp8_max_value(ebits, 2 ** (ebits - 1))
        )


def test_clipping_and_sign_modes():
    maxval = jnp.asarray([3.0])
    x = jnp.asarray([-10.0, 10.0])
    q, _ = quantize_to_fp8_ste(x, 8, maxval, 4.0, 1)
    np.testing.assert_allclose(np.asarray(q), [-3.0, 3.0])
    # unsigned mode clips negatives to zero
    qu, _ = quantize_to_fp8_ste(x, 8, maxval, 4.0, 0)
    np.testing.assert_allclose(np.asarray(qu), [0.0, 3.0])


def test_per_channel_maxval_broadcast():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 16)).astype(np.float32)
    maxval = jnp.asarray([1.0, 2.0, 4.0])
    q, bias = quantize_to_fp8_ste(jnp.asarray(x), 8, maxval, 4.0, 1)
    assert q.shape == x.shape
    assert bias.shape == (3, 1)
    for c in range(3):
        qc, bc = quantize_to_fp8_ste(jnp.asarray(x[c]), 8, maxval[c : c + 1], 4.0, 1)
        np.testing.assert_array_equal(np.asarray(q[c]), np.asarray(qc))
        assert float(bias[c, 0]) == float(bc[0])


def test_ste_gradient_identity_inside_range():
    maxval = jnp.asarray([3.0])

    def f(x):
        q, _ = quantize_to_fp8_ste(x, 8, maxval, 4.0, 1)
        return jnp.sum(q)

    x = jnp.asarray([0.3, -1.7, 2.9, 3.5, -4.0])
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 1.0, 0.0, 0.0])


def test_maxval_gradient_flows():
    """Learnable maxval must receive gradient (QAT, fp8_quantizer.py:295-297)."""

    def f(mv):
        q, _ = quantize_to_fp8_ste(jnp.asarray([5.0]), 8, mv, 4.0, 1)
        return jnp.sum(q)

    g = jax.grad(f)(jnp.asarray([3.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(g[0]) != 0.0


def test_bias_formula():
    # E4M3 with maxval = 448 (IEEE e4m3 max) -> bias 2^4 - log2(448) + log2(2-2^-3) - 1
    maxval = jnp.asarray([448.0])
    _, bias = quantize_to_fp8_ste(jnp.asarray([1.0]), 8, maxval, 3.0, 1)
    expected = round(2**4 - np.log2(448.0) + np.log2(2 - 2.0**-3) - 1)
    assert float(bias[0]) == expected


@pytest.mark.parametrize("clamp", [(None, None), (0.0, None), (0.0, 6.0),
                                   (-1.0, 1.0)])
def test_affine_fold_bit_exact(clamp):
    """The fused affine+clamp FP8 quantize (``quantize_to_fp8_ste_affine``,
    the FP fused-boundary currency) must be BIT-IDENTICAL to decoding the
    affine sequentially and quantizing: same v = x*s + b rounding, and the
    clamp merges into the quantizer clip exactly because the bound
    intervals overlap (lo <= maxval, hi >= minval)."""
    from fp8_quantization_tpu.numerics.fp8_ste import quantize_to_fp8_ste_affine

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 7, 16)).astype(np.float32))
    scale = jnp.asarray(np.abs(rng.normal(size=(16,))).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    maxval = jnp.asarray([2.5], jnp.float32)
    lo, hi = clamp

    # sequential: decode (v = x*s + b, clamp) then quantize
    v = x * scale + bias
    if lo is not None:
        v = jnp.maximum(v, lo)
    if hi is not None:
        v = jnp.minimum(v, hi)
    want, want_b = quantize_to_fp8_ste(v, 8, maxval, 3.0, 1)

    got, got_b = quantize_to_fp8_ste_affine(
        x, scale, bias,
        None if lo is None else jnp.float32(lo),
        None if hi is None else jnp.float32(hi),
        8, maxval, jnp.asarray(3.0), 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
