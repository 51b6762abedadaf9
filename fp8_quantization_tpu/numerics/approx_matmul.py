"""Golden (unfused, pure-jnp) approximate FP matmul — the test oracle.

Re-derivation of the active reference kernel ``custom_matmul_vectorize``
(`/root/reference/approx/approx_matmul_whole_v9.py:10-169`) plus the
hardware-adder overflow/underflow semantics of the v4 lineage
(`/root/reference/approx/approx_matmul_whole_v4.py:160-185`), which v9 accepts
as flags but ignores.

The simulated hardware trick: an FP multiply is approximated by an integer add
of the two operands' bit patterns; the mantissa product error
``(1 + ma·2^-M)(1 + mb·2^-M) - (1 + (ma+mb)·2^-M)`` is corrected by a small
LUT. Two simulation domains are provided:

* float domain (v9, default): approx product =
  ``2^(ea+eb-(ba+bb-br) - br) * [(1+ma·2^-M)(1+mb·2^-M) - 2^-M·LUT[ma,mb]]``
* integer domain (v4, ``sim_hw_add_ofuf=True``): code_R = code_A + code_B +
  B_neg + LUT[ma,mb], with modulo wrap-around and optional OF clamp / UF
  mantissa-wrap fixups, then decoded back to float.

Unlike the reference, ``bias_b`` / ``bias_r`` may be per-output-channel
vectors of shape (N,), vectorizing the reference's per-channel Python loop
(`/root/reference/approx/approx_calculation.py:946-971`) into one call.

This 3-D formulation materializes the (M, K, N) product tensor and exists as
the semantic oracle for the fused Pallas kernels in
``fp8_quantization_tpu/ops/pallas`` — do not use it on the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .codec import (
    compose,
    compose_allnorm,
    decompose,
    decompose_allnorm,
    quantize_exmy,
    quantize_exmy_allnorm,
)


class ApproxStats(NamedTuple):
    """Self-check statistics (reference ``self_check_mode``, v9.py:119-161)."""

    norm_frac_a: jnp.ndarray
    norm_frac_b: jnp.ndarray
    norm_frac_r: jnp.ndarray
    max_err: jnp.ndarray
    mean_err: jnp.ndarray
    rmse: jnp.ndarray


def _bcast_cols(bias, n_cols):
    """Broadcast a scalar or (N,) bias over the columns of a (K, N) operand."""
    bias = jnp.asarray(bias)
    if bias.ndim == 0:
        return bias
    assert bias.shape[-1] in (1, n_cols), bias.shape
    return bias.reshape(1, -1)


def approx_matmul_golden(
    A,
    B,
    expo_width: int,
    mant_width: int,
    bias_a,
    bias_b,
    bias_r,
    error_table,
    *,
    with_approx: bool = True,
    with_s2nn2s_opt: bool = False,
    sim_hw_add_ofuf: bool = False,
    with_of_opt: bool = False,
    with_uf_opt: bool = False,
    golden_clip_of: bool = False,
    quant_btw_mult_accu: bool = True,
    self_check: bool = False,
):
    """Approximate matmul ``A @ B`` with the v9 simulation pipeline.

    Args:
      A: (M, K) float array of values already on the ExMy(bias_a) grid.
      B: (K, N) float array on the ExMy(bias_b) grid.
      bias_a: scalar exponent bias of A.
      bias_b: scalar or (N,) per-output-channel bias of B.
      bias_r: scalar or (N,) bias of the result format.
      error_table: (2^M, 2^M) int array from ``luts.get_error_table``.

    Returns:
      (M, N) result, or (result, ApproxStats) when ``self_check``.
    """
    A = jnp.asarray(A, dtype=jnp.float32)
    B = jnp.asarray(B, dtype=jnp.float32)
    assert A.shape[1] == B.shape[0]
    n = B.shape[1]

    bias_a = jnp.asarray(bias_a)
    bias_b2 = _bcast_cols(bias_b, n)          # broadcast over (K, N)
    bias_r2 = _bcast_cols(bias_r, n)          # broadcast over (*, N)
    error_table = jnp.asarray(error_table, dtype=jnp.int32)

    # **** Golden **** (v9.py:30-32)
    golden_3d = A[:, :, None] * B[None, :, :]
    zero_mask_3d = golden_3d == 0

    # quantize partial products to the result format (v9.py:35-37)
    if quant_btw_mult_accu:
        golden_3d = quantize_exmy(
            golden_3d, expo_width, mant_width, bias_r2, clip_of=golden_clip_of
        )

    # subnormal bookkeeping (v9.py:41-54)
    one = jnp.float32(1.0)
    min_norm_a = jnp.ldexp(one, 1 - jnp.asarray(bias_a, jnp.int32))
    min_norm_b = jnp.ldexp(jnp.full(jnp.shape(bias_b2), 1.0, jnp.float32),
                           1 - jnp.asarray(bias_b2, jnp.int32))
    mant_scale = float(1 << mant_width)

    a_subnorm = jnp.abs(A) < min_norm_a
    b_subnorm = jnp.abs(B) < min_norm_b

    if with_s2nn2s_opt:
        A = jnp.where(a_subnorm, A * mant_scale, A)
        B = jnp.where(b_subnorm, B * mant_scale, B)

    # bit-field extraction (v9.py:58-59)
    a_expo, a_mant = decompose(A, mant_width, bias_a)
    b_expo, b_mant = decompose(B, mant_width, bias_b2)

    # **** Approx **** (v9.py:66-68)
    b_combine_neg = -(bias_a + bias_b2 - bias_r2)            # scalar or (1, N)
    approx_expo = a_expo[:, :, None] + b_expo[None, :, :] + b_combine_neg[None, :, :] \
        if jnp.ndim(b_combine_neg) else a_expo[:, :, None] + b_expo[None, :, :] + b_combine_neg
    sign_3d = jnp.where(golden_3d < 0, -1.0, 1.0)

    if sim_hw_add_ofuf:
        # integer-domain hardware adder (v4.py:160-185)
        approx_3d = _int_domain_product(
            a_expo, a_mant, b_expo, b_mant, b_combine_neg, bias_r2, sign_3d,
            expo_width, mant_width, error_table,
            with_of_opt=with_of_opt, with_uf_opt=with_uf_opt,
        )
    else:
        # float-domain recombination (v9.py:72-98)
        mant_prod = _mant_product(
            mant_width, a_mant[:, :, None], b_mant[None, :, :], error_table, with_approx
        )
        # ldexp is exact where XLA's exp2 is not (see rounding.exp2_exact)
        approx_3d = jnp.ldexp(
            mant_prod * sign_3d, approx_expo - jnp.asarray(bias_r2, jnp.int32)
        )

    norm_frac_r = None
    if with_s2nn2s_opt:
        # scale subnormal contributions back down (v9.py:79-81)
        approx_3d = jnp.where(a_subnorm[:, :, None], approx_3d / mant_scale, approx_3d)
        approx_3d = jnp.where(b_subnorm[None, :, :], approx_3d / mant_scale, approx_3d)
        approx_3d = jnp.where(zero_mask_3d, 0.0, approx_3d)
    else:
        # approximate only where both operands and the product are normal;
        # fall back to golden elsewhere (v9.py:84-98)
        min_norm_r = jnp.ldexp(jnp.full(jnp.shape(bias_r2), 1.0, jnp.float32),
                               1 - jnp.asarray(bias_r2, jnp.int32))
        norm_mask_3d = (
            (a_expo[:, :, None] > 0)
            & (b_expo[None, :, :] > 0)
            & (jnp.abs(golden_3d) >= min_norm_r)
        )
        approx_3d = jnp.where(norm_mask_3d, approx_3d, golden_3d)
        if self_check:
            norm_frac_r = jnp.mean(norm_mask_3d.astype(jnp.float32))

    # requantize approx partial products (v9.py:106-108)
    if quant_btw_mult_accu:
        approx_3d = quantize_exmy(
            approx_3d, expo_width, mant_width, bias_r2, clip_of=golden_clip_of
        )

    # accumulate over K (v9.py:113)
    result = approx_3d.sum(axis=1)

    if self_check:
        golden_2d = golden_3d.sum(axis=1)
        err = jnp.abs(golden_2d - result)
        stats = ApproxStats(
            norm_frac_a=jnp.mean((~a_subnorm).astype(jnp.float32)),
            norm_frac_b=jnp.mean((~b_subnorm).astype(jnp.float32)),
            norm_frac_r=(norm_frac_r if norm_frac_r is not None
                         else jnp.asarray(1.0, jnp.float32)),
            max_err=jnp.max(err),
            mean_err=jnp.mean(err),
            rmse=jnp.sqrt(jnp.mean(err**2)),
        )
        return result, stats
    return result


def approx_matmul_golden_v6(
    A,
    B,
    expo_width: int,
    mant_width: int,
    bias_a,
    bias_b,
    bias_r,
    error_table,
    *,
    self_check: bool = False,
    golden_clip_of: bool = False,
):
    """The v6 lineage's integer-domain approx matmul
    (`/root/reference/approx/approx_matmul_whole_v6.py:10-173`) — kept as a
    selectable oracle so the historical kernel semantics are pinned, not just
    "unified away" (VERDICT r1 #10).

    v6 differs from the active v9 pipeline in three ways:

    * it uses the **all-normal** codec (fp_any_int_v5 lineage, ``clip_OF=True``
      extraction): no subnormals, zero iff the code is exactly 0 — which also
      means a zero operand whose partner code is large can decode to a
      *nonzero* product (code_A=0 still enters the adder); that reference
      behavior is reproduced bit-for-bit;
    * the product is a pure **integer add of flat codes** with per-operand
      biases folded into ``B_neg = -((ba + bb - br) << M)``; a negative raw
      sum clamps to 0, otherwise the LUT compensation is added (v6.py:136-148)
      — there is no float-domain recombination and no golden fallback mask;
    * the K-sum is **unconditionally requantized** onto the all-normal result
      grid with ``clip_OF=False`` (v6.py:104-105).

    ``bias_b`` / ``bias_r`` may be (N,) per-output-channel vectors, as in
    :func:`approx_matmul_golden`.
    """
    A = jnp.asarray(A, dtype=jnp.float32)
    B = jnp.asarray(B, dtype=jnp.float32)
    assert A.shape[1] == B.shape[0]
    n = B.shape[1]

    bias_a = jnp.asarray(bias_a, jnp.int32)
    bias_b2 = jnp.asarray(_bcast_cols(bias_b, n), jnp.int32)   # () or (1, N)
    bias_r2 = jnp.asarray(_bcast_cols(bias_r, n), jnp.int32)
    error_table = jnp.asarray(error_table, dtype=jnp.int32)
    mant_scale = 1 << mant_width

    # all-normal extraction with overflow clipping (v6.py:26-31)
    a_expo, a_mant = decompose_allnorm(A, mant_width, bias_a,
                                       expo_width=expo_width, clip_of=True)
    b_expo, b_mant = decompose_allnorm(B, mant_width, bias_b2,
                                       expo_width=expo_width, clip_of=True)

    # flat codes + combined bias (v6.py:33-40)
    x_int = a_expo * mant_scale + a_mant                        # (M, K)
    y_int = b_expo * mant_scale + b_mant                        # (K, N)
    b_neg = -((bias_a + bias_b2 - bias_r2) * mant_scale)        # () or (1, N)

    raw = x_int[:, :, None] + y_int[None, :, :] + (
        b_neg[None, :, :] if b_neg.ndim else b_neg)
    comp = error_table[a_mant[:, :, None], b_mant[None, :, :]]
    # negative sum -> 0, else add LUT compensation (v6.py:136-148)
    result_int = jnp.where(raw < 0, 0, raw + comp)

    # sign from the operands' signs (v6.py:79-82; sign(0) = +1)
    sign_3d = jnp.where(A < 0, -1.0, 1.0)[:, :, None] * \
        jnp.where(B < 0, -1.0, 1.0)[None, :, :]

    approx_3d = compose_allnorm(result_int // mant_scale,
                                result_int % mant_scale,
                                mant_width, bias_r2, sign=sign_3d)
    result = approx_3d.sum(axis=1)
    # unconditional final requant, clip_OF=False (v6.py:104-105)
    result = quantize_exmy_allnorm(result, expo_width, mant_width, bias_r2,
                                   clip_of=False)

    if self_check:
        golden_3d = A[:, :, None] * B[None, :, :]
        golden_3d = quantize_exmy_allnorm(golden_3d, expo_width, mant_width,
                                          bias_r2, clip_of=golden_clip_of)
        golden_2d = quantize_exmy_allnorm(golden_3d.sum(axis=1), expo_width,
                                          mant_width, bias_r2,
                                          clip_of=golden_clip_of)
        err = jnp.abs(golden_2d - result)
        stats = ApproxStats(
            norm_frac_a=jnp.asarray(1.0, jnp.float32),
            norm_frac_b=jnp.asarray(1.0, jnp.float32),
            norm_frac_r=jnp.asarray(1.0, jnp.float32),
            max_err=jnp.max(err),
            mean_err=jnp.mean(err),
            rmse=jnp.sqrt(jnp.mean(err**2)),
        )
        return result, stats
    return result


def _mant_product(mant_width, x_mant, y_mant, error_table, with_approx):
    """LUT-compensated mantissa product, normals only (v9.py:178-184)."""
    step = 2.0**-mant_width
    exact = (1 + x_mant * step) * (1 + y_mant * step)
    if not with_approx:
        return exact
    comp = error_table[x_mant, y_mant].astype(jnp.float32)
    return exact - step * comp


def _int_domain_product(
    a_expo, a_mant, b_expo, b_mant, b_neg, bias_r2, sign_3d,
    expo_width, mant_width, error_table, *, with_of_opt, with_uf_opt,
):
    """Integer-domain approx multiply with adder wrap-around (v4.py:160-185).

    code_R = code_A + code_B + B_neg·2^M + LUT[ma, mb], simulated on a
    (E+M)-bit adder: the raw sum wraps modulo 2^(E+M); ``with_of_opt`` clamps
    detected overflow to the max code; ``with_uf_opt`` maps detected
    underflow to its mantissa bits (a right-shift-out wrap).
    """
    mant_scale = 1 << mant_width
    max_norm_int = (1 << (expo_width + mant_width)) - 1
    of_uf_mod = 1 << (expo_width + mant_width)

    x_int = a_expo * mant_scale + a_mant        # (M, K)
    y_int = b_expo * mant_scale + b_mant        # (K, N)
    comp = error_table[a_mant[:, :, None], b_mant[None, :, :]]

    b_neg_int = jnp.asarray(b_neg, dtype=jnp.int32) * mant_scale
    raw = x_int[:, :, None] + y_int[None, :, :] + b_neg_int + comp

    overflow = raw > max_norm_int
    underflow = raw < 0
    wrapped = jnp.mod(raw, of_uf_mod)
    if with_of_opt:
        wrapped = jnp.where(overflow, max_norm_int, wrapped)
    if with_uf_opt:
        wrapped = jnp.where(underflow, jnp.mod(wrapped, mant_scale), wrapped)

    expo_r = wrapped // mant_scale
    mant_r = wrapped % mant_scale
    return compose(expo_r, mant_r, mant_width, bias_r2, sign=sign_3d)
