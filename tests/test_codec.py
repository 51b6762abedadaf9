"""ExMy codec unit tests: value-space round-trips and edge cases."""

import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.numerics import (
    E2M5,
    E3M4,
    E4M3,
    compose,
    decompose,
    quantize_exmy,
    value_space,
)

FORMATS = [E4M3, E3M4, E2M5]


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f"E{f.expo_width}M{f.mant_width}")
def test_value_space_roundtrip(fmt):
    """Every representable value decomposes back to its own code (test.py analog)."""
    vs = np.asarray(value_space(fmt.expo_width, fmt.mant_width, fmt.bias))
    for sign in (1.0, -1.0):
        expo, mant = decompose(sign * vs, fmt.mant_width, fmt.bias)
        rebuilt = compose(expo, mant, fmt.mant_width, fmt.bias, sign=np.sign(sign * vs) + (vs == 0))
        np.testing.assert_allclose(np.abs(rebuilt), vs, rtol=0, atol=0)


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f"E{f.expo_width}M{f.mant_width}")
def test_quantize_idempotent(fmt):
    """quantize_exmy is idempotent on its own grid."""
    vs = np.asarray(value_space(fmt.expo_width, fmt.mant_width, fmt.bias))
    grid = np.concatenate([vs, -vs])
    q = quantize_exmy(grid, fmt.expo_width, fmt.mant_width, fmt.bias)
    np.testing.assert_array_equal(np.asarray(q), grid)
    q2 = quantize_exmy(q, fmt.expo_width, fmt.mant_width, fmt.bias)
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(q))


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f"E{f.expo_width}M{f.mant_width}")
def test_quantize_monotone_and_bounded(fmt):
    rng = np.random.default_rng(0)
    x = np.sort(rng.normal(size=4096).astype(np.float32)) * fmt.max_norm
    q = np.asarray(quantize_exmy(x, fmt.expo_width, fmt.mant_width, fmt.bias, clip_of=True))
    assert np.all(np.diff(q) >= 0), "quantization must be monotone"
    assert np.max(np.abs(q)) <= fmt.max_norm


def test_zero_and_subnormals():
    fmt = E3M4
    assert float(quantize_exmy(0.0, 3, 4, fmt.bias)) == 0.0
    # values below min_subnorm/2 round to zero
    tiny = fmt.min_subnorm * 0.49
    assert float(quantize_exmy(tiny, 3, 4, fmt.bias)) == 0.0
    # min_subnorm is exactly representable
    assert float(quantize_exmy(fmt.min_subnorm, 3, 4, fmt.bias)) == fmt.min_subnorm


def test_overflow_extension_vs_clip():
    fmt = E4M3
    big = fmt.max_norm * 4.0
    clipped = float(quantize_exmy(big, 4, 3, fmt.bias, clip_of=True))
    assert clipped == fmt.max_norm
    extended = float(quantize_exmy(big, 4, 3, fmt.bias, clip_of=False))
    assert extended == pytest.approx(big, rel=2 ** -fmt.mant_width)


def test_per_column_bias_vectorization():
    """A (1, N) bias array must equal N independent scalar-bias calls."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 4)).astype(np.float32)
    biases = np.array([1, 3, 5, 7], dtype=np.int32)
    vec = np.asarray(quantize_exmy(x, 3, 4, biases.reshape(1, -1)))
    for j, b in enumerate(biases):
        col = np.asarray(quantize_exmy(x[:, j], 3, 4, int(b)))
        np.testing.assert_array_equal(vec[:, j], col)


def test_jit_and_grad_safe():
    import jax

    f = jax.jit(lambda x: quantize_exmy(x, 4, 3, 7))
    x = jnp.linspace(-3, 3, 64)
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(quantize_exmy(x, 4, 3, 7)))


def test_unpack_exmy_bits_matches_unpack_exmy():
    """The bits-assembly kernel decode (unpack_exmy_bits) is bit-exact with
    the reference decode over every byte code, format, and bias — including
    subnormal codes (e == 0) and both signs."""
    from fp8_quantization_tpu.numerics.codec import (
        unpack_consts, unpack_exmy, unpack_exmy_bits)

    codes = jnp.arange(256, dtype=jnp.uint8).reshape(16, 16)
    for ew, mw in [(3, 4), (4, 3), (2, 5), (5, 2)]:
        for bias in (-3, 0, 1, 3, 7, 15, 31):
            b = jnp.full((1, 16), bias, jnp.int32)
            ref = np.asarray(unpack_exmy(codes, ew, mw, b))
            eb, ss = unpack_consts(b, mw)
            ours = np.asarray(unpack_exmy_bits(codes, ew, mw, eb, ss))
            np.testing.assert_array_equal(ours, ref, err_msg=f"{ew=} {mw=} {bias=}")
    # per-channel (vector) biases broadcast along K
    b = jnp.asarray([[3, 4, 5, 6] * 4], jnp.int32)
    eb, ss = unpack_consts(b, 4)
    np.testing.assert_array_equal(
        np.asarray(unpack_exmy_bits(codes, 3, 4, eb, ss)),
        np.asarray(unpack_exmy(codes, 3, 4, b)))
