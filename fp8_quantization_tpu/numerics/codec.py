"""ExMy codec: float <-> (expo, mant) integer fields, as pure jnp.

TPU-native re-derivation of the reference's torch codec
(`/root/reference/approx/approx_matmul_whole_v9.py:233-362`):

* ``decompose``  ~ ``float_to_fpany_absint_torch``  (v9.py:233-291)
* ``compose``    ~ ``fpany_absint_to_float_torch``  (v9.py:295-329)
* ``quantize_exmy`` ~ ``quant_to_fp_any_vectorize_torch`` (v9.py:333-362)

Unlike the reference these accept the exponent ``bias`` as a (broadcastable)
array, so a per-output-channel weight bias can be handled in one vectorized
call instead of the reference's per-channel Python loop
(`/root/reference/approx/approx_calculation.py:946-971`).

All functions are jittable; ``expo_width``/``mant_width`` are static.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _as_int32(x):
    return jnp.asarray(x).astype(jnp.int32)


def decompose(values, mant_width: int, bias, *, expo_width: int | None = None,
              clip_of: bool = False):
    """Split float values into (expo, mant) int32 fields of an ExMy format.

    Mirrors the frexp/ldexp bit-extraction of the reference (v9.py:257-291):
    subnormals get ``expo == 0`` and a left-shifted mantissa; the mantissa is
    rounded (round-half-even) and clamped to ``2^mant_width - 1`` *without*
    carrying into the exponent — reproducing the reference's behaviour at bin
    edges exactly. Without ``clip_of`` the exponent extends beyond
    ``2^expo_width - 1`` to hold overflow (v9.py:342-343).

    Args:
      values: float array.
      mant_width: mantissa bits (static).
      bias: exponent bias, int scalar or array broadcastable to ``values``.
      expo_width: required when ``clip_of`` is True.
      clip_of: clip |x| > max_norm to the largest finite code.

    Returns:
      (expo, mant) int32 arrays shaped like ``values``.
    """
    values = jnp.asarray(values, dtype=jnp.float32)
    bias_i = _as_int32(bias)
    max_mant = (1 << mant_width) - 1
    mant_scale = 1 << mant_width

    mant, expo = jnp.frexp(values)  # values = mant * 2^expo, |mant| in [0.5, 1)

    # min_norm = 2^(1 - bias), possibly per-element; ldexp is exact where
    # XLA's exp2 (lowered to exp(x*ln2)) is not
    min_norm = jnp.ldexp(jnp.ones(jnp.shape(1 - bias_i), jnp.float32), 1 - bias_i)
    subnorm = jnp.abs(values) < min_norm

    # subnormal: mant_int = |mant| << (expo + bias - 1 + mant_width)
    # normal:    mant_int = (|mant|*2 - 1) << mant_width
    sub_shift = expo + bias_i - 1 + mant_width
    mant_int = jnp.where(
        subnorm,
        jnp.ldexp(jnp.abs(mant), sub_shift),
        jnp.ldexp(jnp.abs(mant) * 2.0 - 1.0, jnp.full_like(expo, mant_width)),
    )
    mant_int = jnp.minimum(jnp.round(mant_int), max_mant).astype(jnp.int32)

    expo_int = jnp.where(subnorm, 0, expo + (bias_i - 1)).astype(jnp.int32)

    if clip_of:
        assert expo_width is not None, "clip_of requires expo_width"
        max_expo = (1 << expo_width) - 1
        # max_norm = 2^(max_expo - bias) * (2 - 2^-mant_width), exactly
        max_norm = jnp.ldexp(
            jnp.full(jnp.shape(bias_i), 2.0 - 2.0 ** (-mant_width), jnp.float32),
            max_expo - bias_i,
        )
        overflow = (values < -max_norm) | (values > max_norm)
        expo_int = jnp.where(overflow, max_expo, expo_int)
        mant_int = jnp.where(overflow, max_mant, mant_int)

    del mant_scale
    return expo_int, mant_int


def compose(expo, mant, mant_width: int, bias, sign=None):
    """Rebuild float values from (expo, mant) fields (v9.py:295-329).

    ``expo == 0`` decodes as subnormal ``2^(1-bias) * m/2^M``; otherwise
    ``2^(expo-bias) * (1 + m/2^M)``. ``expo`` may exceed the nominal field
    width (overflow-extension mode).
    """
    expo = _as_int32(expo)
    mant = _as_int32(mant)
    bias_i = _as_int32(bias)
    mant_scale = float(1 << mant_width)

    frac = mant.astype(jnp.float32) / mant_scale
    subnorm = expo == 0
    # ldexp(frac, shift) is exact; exp2 would not be (see rounding.exp2_exact)
    values = jnp.where(
        subnorm,
        jnp.ldexp(frac, jnp.broadcast_to(1 - bias_i, frac.shape)),
        jnp.ldexp(1.0 + frac, expo - bias_i),
    )
    if sign is not None:
        values = values * jnp.asarray(sign, dtype=jnp.float32)
    return values


def code_of(expo, mant, mant_width: int):
    """Pack fields into the flat integer code ``expo << M | mant`` (v9.py:291)."""
    return _as_int32(expo) * (1 << mant_width) + _as_int32(mant)


def fields_of(code, mant_width: int):
    """Unpack the flat integer code into (expo, mant) (v9.py:313-316)."""
    code = _as_int32(code)
    return code // (1 << mant_width), code % (1 << mant_width)


def quantize_exmy(arr, expo_width: int, mant_width: int, bias, *, clip_of: bool = True):
    """Round-trip quantize floats onto the ExMy grid (v9.py:333-362).

    This is the ``quant_to_fp_any_vectorize_torch`` analog used for
    ``quant_btw_mult_accu`` (requantizing partial products before the K-sum).
    """
    arr = jnp.asarray(arr, dtype=jnp.float32)
    expo, mant = decompose(arr, mant_width, bias, expo_width=expo_width, clip_of=clip_of)
    sign = jnp.where(arr < 0, -1.0, 1.0).astype(jnp.float32)
    return compose(expo, mant, mant_width, bias, sign=sign)


def decompose_allnorm(values, mant_width: int, bias, *,
                      expo_width: int | None = None, clip_of: bool = False):
    """All-normal ExMy variant: no subnormals; zero iff expo == mant == 0
    (`/root/reference/approx/fp_any_int_v5.py:60-117`).

    Every value encodes as ``(-1)^s 2^(e-bias) (1 + m/2^M)``; magnitudes below
    ``min_value = 2^-bias (1 + 2^-M)`` collapse to the zero code.
    """
    values = jnp.asarray(values, dtype=jnp.float32)
    bias_i = _as_int32(bias)
    max_mant = (1 << mant_width) - 1

    mant, expo = jnp.frexp(values)
    min_value = jnp.ldexp(
        jnp.full(jnp.shape(bias_i), 1.0 + 2.0 ** (-mant_width), jnp.float32),
        -bias_i,
    )
    zero = (values > -min_value) & (values < min_value)

    mant_int = jnp.where(
        zero,
        0.0,
        jnp.ldexp(jnp.abs(mant) * 2.0 - 1.0, jnp.full_like(expo, mant_width)),
    )
    mant_int = jnp.minimum(jnp.round(mant_int), max_mant).astype(jnp.int32)
    expo_int = jnp.where(zero, 0, expo + (bias_i - 1)).astype(jnp.int32)

    if clip_of:
        assert expo_width is not None, "clip_of requires expo_width"
        max_expo = (1 << expo_width) - 1
        max_value = jnp.ldexp(
            jnp.full(jnp.shape(bias_i), 2.0 - 2.0 ** (-mant_width), jnp.float32),
            max_expo - bias_i,
        )
        overflow = (values < -max_value) | (values > max_value)
        expo_int = jnp.where(overflow, max_expo, expo_int)
        mant_int = jnp.where(overflow, max_mant, mant_int)
    return expo_int, mant_int


def compose_allnorm(expo, mant, mant_width: int, bias, sign=None):
    """Inverse of ``decompose_allnorm`` (fp_any_int_v5.py:123-162)."""
    expo = _as_int32(expo)
    mant = _as_int32(mant)
    bias_i = _as_int32(bias)
    frac = mant.astype(jnp.float32) / float(1 << mant_width)
    zero = (expo == 0) & (mant == 0)
    values = jnp.where(zero, 0.0, jnp.ldexp(1.0 + frac, expo - bias_i))
    if sign is not None:
        values = values * jnp.asarray(sign, dtype=jnp.float32)
    return values


def quantize_exmy_allnorm(arr, expo_width: int, mant_width: int, bias, *,
                          clip_of: bool = True):
    """All-normal round-trip quantize — the v6 lineage's in-file
    ``quant_to_fp_any_vectorize_torch``
    (`/root/reference/approx/approx_matmul_whole_v6.py:353-383`), which uses
    the no-subnormal codec: magnitudes below ``2^-bias (1 + 2^-M)`` collapse
    to zero instead of denormalizing."""
    arr = jnp.asarray(arr, dtype=jnp.float32)
    expo, mant = decompose_allnorm(arr, mant_width, bias,
                                   expo_width=expo_width, clip_of=clip_of)
    sign = jnp.where(arr < 0, -1.0, 1.0).astype(jnp.float32)
    return compose_allnorm(expo, mant, mant_width, bias, sign=sign)


def pack_exmy(values, expo_width: int, mant_width: int, bias, *,
              signed: bool = True, clip_of: bool = False):
    """Pack grid values into flat byte codes ``s:1 | e:expo_width | m:mant_width``.

    This is real FP8 *storage* (1 byte per value) — the reference only ever
    simulates FP8 in float32 tensors (SURVEY §0); storing the codes halves
    weight/KV HBM footprint and bandwidth vs the bf16 fast mode. ``values``
    must already sit on the ExMy grid (e.g. STE-quantizer outputs); use
    :func:`unpack_exmy` round-trip equality to verify losslessness — the STE
    grid's top binade can carry to exponent ``2^expo_width`` (one past the
    field), in which case the caller should retry with ``bias - 1`` or fall
    back to bf16 storage (see ``ops.fastpath.pack_weights``).

    With ``clip_of`` the values are first clamped onto the format's grid
    (codec convention: out-of-range magnitudes take the largest finite code)
    — use this to pack values that are NOT already known to fit, e.g. the
    packed KV cache's jit-time encode where no host-side round-trip check is
    possible.

    Returns a uint8 array when the code fits in 8 bits, else int32.
    """
    total = int(signed) + expo_width + mant_width
    assert total <= 32
    expo, mant = decompose(values, mant_width, bias, expo_width=expo_width,
                           clip_of=clip_of)
    expo = jnp.clip(expo, 0, (1 << expo_width) - 1)
    code = (expo << mant_width) | mant
    if signed:
        neg = jnp.signbit(jnp.asarray(values, jnp.float32)) & (code > 0)
        code = code | (neg.astype(jnp.int32) << (expo_width + mant_width))
    return code.astype(jnp.uint8 if total <= 8 else jnp.int32)


def unpack_exmy(codes, expo_width: int, mant_width: int, bias, *,
                signed: bool = True, dtype=jnp.float32):
    """Decode flat byte codes back to float — inverse of :func:`pack_exmy`.

    Branch-free formulation that lowers to pure VPU integer ops + one vector
    bitcast, so the identical expression runs inside Pallas kernels
    (``ops/pallas/dequant_matmul.py``) and as a plain jitted fn:

      value = (implicit_one + m * 2^-M) * 2^(max(e, 1) - bias)

    where ``2^k`` is built by writing ``k + 127`` into an f32 exponent field
    (exact, unlike XLA's ``exp2``) and ``implicit_one`` is 0 for the
    subnormal binade ``e == 0``.
    """
    c = _as_int32(codes)
    bias_i = _as_int32(bias)
    em = c & ((1 << (expo_width + mant_width)) - 1)
    e = em >> mant_width
    m = em & ((1 << mant_width) - 1)
    ee = jnp.maximum(e, 1)
    pow2 = jnp.asarray(
        lax.bitcast_convert_type(
            jnp.left_shift(ee - bias_i + 127, 23), jnp.float32
        )
    )
    lead = jnp.where(e > 0, 1.0, 0.0).astype(jnp.float32)
    val = (lead + m.astype(jnp.float32) * (2.0 ** -mant_width)) * pow2
    if signed:
        s = c >> (expo_width + mant_width)
        val = jnp.where(s > 0, -val, val)
    return val.astype(dtype)


def unpack_exmy_bits(codes, expo_width: int, mant_width: int,
                     ebase_bits, sub_scale, dtype=jnp.float32):
    """Fast in-kernel decode: assemble the f32 bit pattern directly.

    Bit-exact with :func:`unpack_exmy` but ~25% fewer VPU ops — the decode
    is the throughput bound of the packed-weight serving kernel (HBM streams
    1 B/element in ~1.2 ps while N decode ops cost N*0.26 ps on a v5e VPU,
    so every op off the decode shows up in tokens/s; VERDICT r1 #3).

    The trick: for a NORMAL code, the ``e:E|m:M`` field pair shifted left by
    ``23 - M`` lands the exponent exactly at the f32 exponent field and the
    mantissa at the f32 mantissa top, so

      f32_bits = (em << (23 - M)) + ((127 - bias) << 23)

    is the decoded value — one shift, one add, one bitcast. Subnormals
    (e == 0) decode as ``m * 2^(1 - bias - M)``, one int->float convert and
    one multiply. The two per-channel constants ride in as precomputed
    vectors (the caller hoists them out of the kernel):

      ebase_bits = (127 - bias) << 23          (int32)
      sub_scale  = 2^(1 - bias - mant_width)   (float32)
    """
    c = _as_int32(codes)
    em = c & ((1 << (expo_width + mant_width)) - 1)
    fnorm = lax.bitcast_convert_type(
        jnp.left_shift(em, 23 - mant_width) + ebase_bits, jnp.float32
    )
    fsub = em.astype(jnp.float32) * sub_scale
    val = jnp.where(em >= (1 << mant_width), fnorm, fsub)
    s = c >> (expo_width + mant_width)
    val = jnp.where(s > 0, -val, val)
    return val.astype(dtype)


def unpack_consts(bias, mant_width: int):
    """The (ebase_bits, sub_scale) per-channel constants for
    :func:`unpack_exmy_bits`."""
    bias_i = _as_int32(bias)
    ebase_bits = jnp.left_shift(127 - bias_i, 23)
    sub_scale = jnp.asarray(lax.bitcast_convert_type(
        jnp.left_shift(127 + 1 - bias_i - mant_width, 23), jnp.float32))
    return ebase_bits, sub_scale


def value_space(expo_width: int, mant_width: int, bias):
    """All 2^(E+M) non-negative code values of the format (v9.py:366-387)."""
    codes = jnp.arange(1 << (expo_width + mant_width), dtype=jnp.int32)
    expo, mant = fields_of(codes, mant_width)
    return compose(expo, mant, mant_width, bias)
