"""Fused Pallas TPU kernel for the approximate-multiplier matmul simulation.

Simulates `custom_matmul_vectorize` (v9 float-domain semantics,
`/root/reference/approx/approx_matmul_whole_v9.py:10-169`) without ever
materializing the (M, K, N) product tensor the reference keeps in HBM, and
with the per-output-channel weight bias vectorized (the reference launches a
python loop per channel, approx_calculation.py:946-971).

Per output tile (bm, bn), the kernel walks K one slice at a time entirely in
VMEM/registers:

  golden   = a_col ⊗ b_row                                  (VPU outer product)
  golden_q = exmy_requant(golden, bias_r)                   [quant_btw_mult_accu]
  comp     = onehot(ma) @ LUT @ onehot(mb)ᵀ                 (two tiny MXU
             matmuls — a TPU-native replacement for the 2-D LUT gather)
  approx   = 2^(ea+eb-(bA+bB-bR)-bR) · [(1+ma·s)(1+mb·s) - s·comp] · sign
  out      = where(both normal & |golden_q| >= min_norm_r, approx, golden_q)
  acc     += exmy_requant(out, bias_r)                      [quant_btw_mult_accu]

All ExMy decompositions / requantizations are integer exponent bit-ops (no
transcendentals) and reproduce the reference codec's no-carry rounding: a
mantissa that rounds up to the next binade is clamped at the largest code of
its own binade (float_to_fpany_absint_torch's clamp, v9.py:272-276).

Supported static switches: ``with_approx``, ``quant_btw_mult_accu``,
``golden_clip_of``, ``with_s2nn2s_opt``. (The v4 integer-domain OF/UF adder
path stays on the jnp oracle.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...numerics.luts import get_error_table


def _pow2(e_int):
    """Exact 2^e for int32 e in [-126, 127], elementwise, via bitcast.

    Mosaic's tpu.bitcast only takes vectors — promote scalars to (1, 1).
    """
    e_int = jnp.asarray(e_int)
    if e_int.ndim == 0:
        e_int = e_int.reshape(1, 1)
    return lax.bitcast_convert_type(
        jnp.left_shift(jnp.clip(e_int + 127, 1, 254), 23), jnp.float32
    )


def _round_even(x):
    return lax.round(x, lax.RoundingMethod.TO_NEAREST_EVEN)


def _ieee_exp(x):
    bits = lax.bitcast_convert_type(x, jnp.int32)
    return (jnp.right_shift(bits, 23) & 0xFF) - 127


def exmy_decompose_block(x, bias, mant_width: int):
    """(expo, mant_int, frac) of ExMy(bias) for a float32 block.

    expo: int32 field (0 => subnormal); mant_int: int32 mantissa field;
    frac = 1 + mant/2^M (normal) or mant/2^M (subnormal) — the value's
    significand as float. Mirrors codec.decompose bit-exactly.
    """
    e = _ieee_exp(x)                     # unbiased ieee exponent
    expo = e + bias                      # ExMy exponent field candidate
    subnorm = expo < 1
    ax = jnp.abs(x)
    # normal: mant units = round((|x|·2^-e - 1)·2^M)
    m_norm = _round_even((ax * _pow2(-e) - 1.0) * float(1 << mant_width))
    # subnormal: mant units = round(|x|·2^(bias-1+M))
    m_sub = _round_even(ax * _pow2(bias - 1 + mant_width))
    max_mant = float((1 << mant_width) - 1)
    mant = jnp.minimum(jnp.where(subnorm, m_sub, m_norm), max_mant)
    expo = jnp.where(subnorm, 0, expo)
    mant_i = mant.astype(jnp.int32)
    frac = mant * (2.0 ** -mant_width) + jnp.where(subnorm, 0.0, 1.0)
    return expo.astype(jnp.int32), mant_i, frac


def exmy_requant_block(v, bias, mant_width: int, expo_width: int,
                       clip_of: bool):
    """Round v onto the ExMy(bias) grid — ``quant_to_fp_any`` semantics
    (no-carry clamp at binade tops; exponent extension unless clip_of)."""
    if clip_of:
        max_norm = _pow2(
            jnp.asarray((1 << expo_width) - 1, jnp.int32) - bias
        ) * (2.0 - 2.0 ** -mant_width)
        v = jnp.clip(v, -max_norm, max_norm)
    e = _ieee_exp(v)
    ls = jnp.maximum(e + bias, 1)                      # binade index
    subnorm = (e + bias) < 1
    scale = _pow2(ls - mant_width - bias)
    inv_scale = _pow2(mant_width + bias - ls)
    units = _round_even(jnp.abs(v) * inv_scale)
    hi = jnp.where(subnorm, float((1 << mant_width) - 1),
                   float((1 << (mant_width + 1)) - 1))
    units = jnp.minimum(units, hi)
    return jnp.where(v < 0, -units, units) * scale


def _approx_kernel(
    bias_a_ref, bias_r_ref,                 # SMEM (1,1) int32
    a_ref, b_ref, bias_b_ref, lut_ref,      # VMEM (a is pre-transposed (bk, bm))
    o_ref, acc_ref,
    *, mant_width: int, expo_width: int, bk: int, kc: int, n_k: int,
    with_approx: bool, quant_btw: bool, clip_of: bool, s2nn2s: bool,
):
    kblk = pl.program_id(2)

    @pl.when(kblk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bias_a = bias_a_ref[0, 0]
    bias_r = bias_r_ref[0, 0]
    bias_b = bias_b_ref[:]                                  # (1, bn) int32
    s = 2.0 ** -mant_width
    mant_scale = float(1 << mant_width)

    at_blk = a_ref[:]                                       # (bk, bm) f32
    b_blk = b_ref[:]                                        # (bk, bn) f32

    one_i = jnp.ones((1, 1), jnp.int32)
    min_norm_r = _pow2(one_i - bias_r)                      # (1, 1)

    if s2nn2s:
        # scale subnormal operands up before extraction (v9.py:52-54)
        min_norm_a = _pow2(one_i - bias_a)
        min_norm_b = _pow2(1 - bias_b)                      # (1, bn)
        a_sub = (jnp.abs(at_blk) < min_norm_a).astype(jnp.float32)
        b_sub = (jnp.abs(b_blk) < min_norm_b).astype(jnp.float32)
        a_eff = jnp.where(a_sub > 0, at_blk * mant_scale, at_blk)
        b_eff = jnp.where(b_sub > 0, b_blk * mant_scale, b_blk)
    else:
        a_sub = b_sub = None
        a_eff, b_eff = at_blk, b_blk

    # decompose whole tiles once at full VPU width; A side is K-major so the
    # K loop uses free *static* leading-dim slices (Mosaic forbids unaligned
    # dynamic lane slicing)
    ae, am, af = exmy_decompose_block(a_eff, bias_a, mant_width)   # (bk, bm)
    be, bmant, bf = exmy_decompose_block(b_eff, bias_b, mant_width)  # (bk, bn)
    am_f = am.astype(jnp.float32)
    bm_f = bmant.astype(jnp.float32)

    lut = lut_ref[:]                                        # (2^M, 2^M) f32
    nm = 1 << mant_width

    b_neg = -(bias_a + bias_b - bias_r)                     # (1, bn) int32
    iota_nm = lax.broadcasted_iota(jnp.int32, (1, 1, nm), 2).astype(jnp.float32)

    def _cm(mat, k0):
        # (kc, bm) slice -> (kc, bm, 1); explicit slice+expand_dims (mixed
        # basic/newaxis indexing lowers as a gather, unsupported in Mosaic)
        return jnp.expand_dims(lax.slice_in_dim(mat, k0, k0 + kc, axis=0), 2)

    def _cn(mat, k0):
        return jnp.expand_dims(lax.slice_in_dim(mat, k0, k0 + kc, axis=0), 1)

    # K chunks of kc: all work is (kc, bm|1, bn|1)-shaped 3-D broadcasting;
    # the LUT gather becomes kc statically-unrolled small MXU matmuls
    for k0 in range(0, bk, kc):
        a_c = _cm(at_blk, k0)                               # (kc, bm, 1)
        b_c = _cn(b_blk, k0)                                # (kc, 1, bn)
        golden = a_c * b_c                                  # (kc, bm, bn)
        if quant_btw:
            golden = exmy_requant_block(golden, bias_r, mant_width,
                                        expo_width, clip_of)
        sign = jnp.where(golden < 0, -1.0, 1.0)

        ae_c = _cm(ae, k0)
        af_c = _cm(af, k0)
        be_c = _cn(be, k0)
        bf_c = _cn(bf, k0)

        if with_approx:
            am_c = _cm(am_f, k0)                            # (kc, bm, 1)
            bm_c = _cn(bm_f, k0)                            # (kc, 1, bn)
            oh_a = (am_c == iota_nm).astype(jnp.float32)    # (kc, bm, nm)
            oh_bt = (jnp.swapaxes(iota_nm, 1, 2) == bm_c).astype(
                jnp.float32)                                 # (kc, nm, bn)
            # LUT gather as onehot @ LUT @ onehotT; statically unrolled 2-D
            # dots (Mosaic has no batched dot_general)
            comp = jnp.stack([
                jnp.dot(
                    lax.index_in_dim(oh_a, kk, 0, keepdims=False),
                    jnp.dot(lut,
                            lax.index_in_dim(oh_bt, kk, 0, keepdims=False),
                            preferred_element_type=jnp.float32),
                    preferred_element_type=jnp.float32,
                )
                for kk in range(kc)
            ])                                               # (kc, bm, bn)
            mant_prod = af_c * bf_c - s * comp
        else:
            mant_prod = af_c * bf_c

        expo = ae_c + be_c + b_neg[None, :, :] - bias_r     # (kc, bm, bn)
        approx = mant_prod * sign * _pow2(expo)

        if s2nn2s:
            a_sub_c = _cm(a_sub, k0)
            b_sub_c = _cn(b_sub, k0)
            approx = jnp.where(a_sub_c > 0, approx * s, approx)
            approx = jnp.where(b_sub_c > 0, approx * s, approx)
            out = jnp.where(golden == 0.0, 0.0, approx)
        else:
            norm = (ae_c > 0) & (be_c > 0) & (
                jnp.abs(golden) >= min_norm_r[None, :, :])
            out = jnp.where(norm, approx, golden)

        if quant_btw:
            out = exmy_requant_block(out, bias_r, mant_width, expo_width,
                                     clip_of)
        acc_ref[:] += jnp.sum(out, axis=0)

    @pl.when(kblk == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _pad(x, mult, axis):
    rem = x.shape[axis] % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, mult - rem)
    return jnp.pad(x, pad)


@functools.partial(
    jax.jit,
    static_argnames=("expo_width", "mant_width", "with_comp", "dnsmp_factor",
                     "with_approx", "with_s2nn2s_opt", "quant_btw_mult_accu",
                     "golden_clip_of", "bm", "bn", "bk", "kc",
                     "vmem_limit_mb", "m_split"),
)
def approx_matmul_pallas(
    a,
    b,
    bias_a,
    bias_b,
    bias_r,
    *,
    expo_width: int,
    mant_width: int,
    with_comp: bool = False,
    dnsmp_factor: int = 3,
    with_approx: bool = True,
    with_s2nn2s_opt: bool = False,
    quant_btw_mult_accu: bool = True,
    golden_clip_of: bool = False,
    bm: Optional[int] = None,
    bn: Optional[int] = None,
    bk: Optional[int] = None,
    kc: int = 4,
    vmem_limit_mb: Optional[int] = None,
    m_split: int = 4096,
):
    """Approx matmul ``a @ b`` with v9 float-domain simulation semantics.

    Args:
      a: (M, K) float32 on the ExMy(bias_a) grid.
      b: (K, N) float32 on the ExMy(bias_b[n]) grids.
      bias_a / bias_r: scalar int exponent biases.
      bias_b: scalar or (N,) per-output-channel weight bias.
      bm/bn/bk: tile sizes; default adapts to the problem (<= 256, respecting
        the (8, 128) f32 tiling grain). kc: K-chunk processed per unrolled
        iteration as (kc, bm, bn) 3-D work. kc=4 measured fastest on
        v5e at 512^3 (2.25 ms vs 2.84 at kc=8, 3.07 at kc=1; larger
        tiles overflow VMEM) — scripts/sweep_approx_tiles.py.
      m_split: dispatch row cap. Calls with M above it run as a
        ``lax.map`` over row chunks of this size (one kernel compile,
        sequential execution). Needed because XLA may place a custom
        call's WHOLE result buffer in scoped VMEM when it feeds a fusion
        (observed at M=25088, N=128 inside the MobileNetV2 conv body:
        f32[25088,128]{..S(1)} = 12.9 MB output blew the 16 MB scoped
        limit, r5). Row chunks are bit-identical to the unsplit call —
        each output row depends only on its own A rows.

    Returns (M, N) float32.
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2

    if m > m_split:
        kwargs = dict(
            expo_width=expo_width, mant_width=mant_width,
            with_comp=with_comp, dnsmp_factor=dnsmp_factor,
            with_approx=with_approx, with_s2nn2s_opt=with_s2nn2s_opt,
            quant_btw_mult_accu=quant_btw_mult_accu,
            golden_clip_of=golden_clip_of, bm=bm, bn=bn, bk=bk, kc=kc,
            vmem_limit_mb=vmem_limit_mb, m_split=m_split,
        )
        ap = _pad(a, m_split, 0)
        chunks = ap.reshape(ap.shape[0] // m_split, m_split, k)
        out = jax.lax.map(
            lambda ai: approx_matmul_pallas(ai, b, bias_a, bias_b, bias_r,
                                            **kwargs),
            chunks)
        return out.reshape(-1, n)[:m]

    def _ru(v, g):
        return -(-v // g) * g

    if bm is None:
        bm = min(256, _ru(m, 8))
    if bn is None:
        bn = min(256, _ru(n, 128))
    if bk is None:
        bk = min(256, _ru(k, kc))
    bk = _ru(bk, kc)

    bias_a = jnp.asarray(bias_a, jnp.int32).reshape(1, 1)
    bias_r = jnp.asarray(bias_r, jnp.int32).reshape(1, 1)
    bias_b = jnp.broadcast_to(jnp.asarray(bias_b, jnp.int32).reshape(-1),
                              (n,))[None, :]

    lut = jnp.asarray(
        get_error_table(expo_width, mant_width, with_comp, dnsmp_factor),
        jnp.float32,
    )

    ap = _pad(_pad(a, bm, 0), bk, 1)
    bp = _pad(_pad(b, bk, 0), bn, 1)
    bias_bp = _pad(bias_b, bn, 1)
    mp, kp = ap.shape
    np_ = bp.shape[1]
    n_k = kp // bk
    at = ap.T  # K-major A so the kernel's K loop uses static sublane slices

    smem = lambda: pl.BlockSpec((1, 1), lambda i, j, kk: (0, 0),
                                memory_space=pltpu.SMEM)
    interpret = jax.default_backend() not in ("tpu", "axon")

    out = pl.pallas_call(
        functools.partial(
            _approx_kernel,
            mant_width=mant_width, expo_width=expo_width, bk=bk, kc=kc,
            n_k=n_k,
            with_approx=with_approx, quant_btw=quant_btw_mult_accu,
            clip_of=golden_clip_of, s2nn2s=with_s2nn2s_opt,
        ),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            smem(), smem(),
            pl.BlockSpec((bk, bm), lambda i, j, kk: (kk, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lut, whole
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(vmem_limit_mb * 1024 * 1024
                              if vmem_limit_mb else None),
        ),
        interpret=interpret,
    )(bias_a, bias_r, at, bp, bias_bp, lut)
    return out[:m, :n]
