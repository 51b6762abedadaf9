"""Native C++ codec vs jnp codec: independent implementations must agree
bit-for-bit."""

import numpy as np
import pytest

from fp8_quantization_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec not built (g++/make missing)"
)


@pytest.mark.parametrize("ew,mw,bias", [(4, 3, 7), (3, 4, 3), (2, 5, 1),
                                        (3, 4, 8)])
def test_quantize_bitexact(ew, mw, bias, rng):
    from fp8_quantization_tpu.numerics import quantize_exmy

    x = np.concatenate([
        (rng.normal(size=2039) * 8).astype(np.float32),
        np.array([0.0, -0.0, 1e-30, -1e-30, 1e10, -1e10], np.float32),
    ])
    for clip in (True, False):
        ours = np.asarray(quantize_exmy(x, ew, mw, bias, clip_of=clip))
        nat = native.exmy_quantize(x, ew, mw, bias, clip_of=clip)
        np.testing.assert_array_equal(nat, ours)


@pytest.mark.parametrize("ew,mw,bias", [(4, 3, 7), (3, 4, 3)])
def test_decompose_bitexact(ew, mw, bias, rng):
    from fp8_quantization_tpu.numerics import decompose

    x = (rng.normal(size=4096) * 4).astype(np.float32)
    oe, om = decompose(x, mw, bias)
    ne, nm = native.exmy_decompose(x, ew, mw, bias)
    np.testing.assert_array_equal(ne, np.asarray(oe))
    np.testing.assert_array_equal(nm, np.asarray(om))


@pytest.mark.parametrize("mant,sign", [(4, 1), (3, 1), (2, 1), (4, 0)])
def test_fp8_ste_bitexact(mant, sign, rng):
    import jax.numpy as jnp

    from fp8_quantization_tpu.numerics import quantize_to_fp8_ste

    x = (rng.normal(size=4096) * 3).astype(np.float32)
    maxval = 2.37
    ours, bias = quantize_to_fp8_ste(x, 8, jnp.asarray([maxval]), float(mant),
                                     sign)
    nat, nat_bias = native.fp8_ste_quantize(x, 8, maxval, mant, sign)
    assert nat_bias == int(bias[0])
    np.testing.assert_array_equal(nat, np.asarray(ours))
