"""Inference fast path: XLA-fused quantized matmul + site finalization.

Benchmark-driven design (see bench.py): on TPU, XLA fuses the bit-ops
quantizer (``quantize_block``) into the matmul prologue/epilogue *better than
a hand-written Pallas mono-kernel* — the chained quantize->dot->requant runs
at full MXU speed-of-light (it beat the plain unquantized matmul chain in our
measurements because the requant epilogue emits bf16, halving the output
bandwidth). The Pallas kernels remain for the approx simulation where XLA has
no fast lowering.

``finalize_*`` converts calibrated QuantSite states into frozen fast-path
params: weights pre-quantized onto their ExMy grid and cast bf16 (exact for
mant_width <= 7), per-tensor act/res quantizers reduced to
(maxval, bias, mant_bits, sign_bits) scalars.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import QMethod, QuantConfig
from ..quant import quantizers
from .pallas.fused_matmul import quantize_block


class ScalarQuantParams(NamedTuple):
    maxval: jnp.ndarray   # f32 scalar
    bias: jnp.ndarray     # i32 scalar
    mant: jnp.ndarray     # i32 scalar
    sign: jnp.ndarray     # i32 scalar


class FastDenseParams(NamedTuple):
    w16: jnp.ndarray                       # (in, out) bf16, grid values
    bias: Optional[jnp.ndarray]            # (out,) f32 or None
    act: Optional[ScalarQuantParams]       # input quantizer (per-tensor)
    res: Optional[ScalarQuantParams]       # result requantizer (per-tensor)


def scalar_params(qcfg, qstate) -> ScalarQuantParams:
    """Reduce a per-tensor FP QuantSite state to fast-path scalars."""
    assert qcfg.method == QMethod.fp_quantizer
    assert qstate["maxval"].shape[0] == 1, "fast path needs per-tensor params"
    bias = quantizers.fp_bias(qcfg, qstate)
    return ScalarQuantParams(
        maxval=qstate["maxval"][0],
        bias=bias[0].astype(jnp.int32),
        mant=jnp.round(qstate["mantissa_bits"][0]).astype(jnp.int32),
        sign=qstate["sign_bits"][0].astype(jnp.int32),
    )


def finalize_dense(qc: QuantConfig, layer_params: dict, layer_quant: dict,
                   n_bits_w: Optional[int] = None) -> FastDenseParams:
    """Freeze one calibrated QuantDense into fast-path params."""
    wq_cfg = qc.weight_quantizer(n_bits_w)
    w = layer_params["kernel"]
    wq = quantizers.apply(wq_cfg, layer_quant["weight_quantizer"]["q"], w,
                          channel_axis=-1)
    act = None
    if qc.quantize_input:
        act = scalar_params(qc.act_quantizer(),
                            layer_quant["activation_quantizer"]["q"])
    res = None
    if qc.run_method.res_quantizer_flag and "res_quantizer" in layer_quant:
        res = scalar_params(qc.act_quantizer(), layer_quant["res_quantizer"]["q"])
    return FastDenseParams(
        w16=wq.astype(jnp.bfloat16),
        bias=layer_params.get("bias"),
        act=act,
        res=res,
    )


def quantized_matmul(x, w16, act: Optional[ScalarQuantParams] = None,
                     res: Optional[ScalarQuantParams] = None,
                     bias=None, out_dtype=jnp.float32):
    """``requant(quantize(x) @ w16) + bias`` with XLA doing the fusion.

    x: (..., K) float32 (or bf16 already-quantized when ``act`` is None).
    """
    xq = x
    if act is not None:
        xq = quantize_block(x, act.maxval, act.bias, act.mant, act.sign)
    out = jnp.dot(xq.astype(jnp.bfloat16), w16,
                  preferred_element_type=jnp.float32)
    if bias is not None:
        # bias adds before the res requant (run_forward returns xw+b, then
        # the res_quantizer applies — hijacker.py:89-96)
        out = out + bias
    if res is not None:
        out = quantize_block(out, res.maxval, res.bias, res.mant, res.sign)
    return out.astype(out_dtype)


def fast_dense_apply(p: FastDenseParams, x, out_dtype=jnp.float32):
    """Apply a finalized dense layer (no activation fn)."""
    return quantized_matmul(x, p.w16, p.act, p.res, p.bias, out_dtype)


# --------------------------------------------------------------------------
# INT8 MXU fast path: native int8 matmul for the uniform quantizers
# --------------------------------------------------------------------------

class Int8Weights(NamedTuple):
    """Frozen uniform-quantized weights as native int8 codes.

    Measured on the v5e (r4 memory-honest bench — weight slabs rotated past
    VMEM, 50 ms slope floor): the int8 chain runs at 365.6 TOP/s (0.928
    MFU) = 1.97x the bf16 matmul chain, AND is ~4 orders of magnitude closer to the f64 oracle
    than the simulated path — uniform-grid values are not bf16-exact, so the
    simulation's f32 dot (which rides the bf16 MXU) truncates its operands,
    while the int8 dot accumulates the true integer codes exactly.

    The stored representation is ``w = scale_n * (i + 128 - zp_n)`` with
    ``i`` int8 — symmetric signed weights have ``zp = 128`` so ``i`` is the
    plain signed code. ``wsum`` carries per-channel code sums for the
    zero-point correction terms.
    """

    codes: jnp.ndarray   # (K, N) int8
    scale: jnp.ndarray   # (N,) f32 per-channel (or broadcast per-tensor)
    zp: Optional[jnp.ndarray]  # (N,) f32 zero point in [0, 255] coords, or
    #                    None when every channel is signed-symmetric (the
    #                    Xsum correction then elides statically)
    wsum: jnp.ndarray    # (N,) int32 — sum_k codes[k, n]


def quantize_acts_int8(x, scale, zero_point, int_min, int_max):
    """Quantize activations straight to int8 codes ``i = x_int - 128*u``.

    Mirrors ``uniform_apply``'s integer mapping (x_int = clip(round(x/s)+zp))
    but emits the integer codes for the MXU instead of fake-quantized floats.
    ``int_min/int_max`` select signed (-2^(b-1), 2^(b-1)-1) or unsigned /
    asymmetric (0, 2^b-1) coordinates; unsigned coords are shifted by -128
    into int8. Returns (codes int8, c_x) with ``x = scale * (codes - c_x)``.
    """
    x_int = jnp.clip(jnp.round(x / scale) + zero_point, int_min, int_max)
    shift = jnp.where(int_min < 0, 0.0, 128.0)
    codes = (x_int - shift).astype(jnp.int8)
    c_x = zero_point - shift
    return codes, c_x


def quantize_acts_affine(aff, scale, zero_point, int_min, int_max):
    """:func:`quantize_acts_int8` over a pending-:class:`Affine` input.

    The producer's dequant/BN/ReLU6 chain folds into this site's
    quantization (one mul-add-round-clip per element; see
    ``quant.sites.Affine``); same (codes, c_x) contract as
    ``quantize_acts_int8``."""
    from ..quant.sites import fold_quantize_affine

    x_int = fold_quantize_affine(aff, scale, zero_point, int_min, int_max)
    shift = jnp.where(int_min < 0, 0.0, 128.0)
    codes = (x_int - shift).astype(jnp.int8)
    return codes, zero_point - shift


def pack_int4(codes):
    """Nibble-pack int8 codes in [-8, 7]: 0.5 B/weight.

    Split-K-halves layout: byte row i holds code row i (low nibble) and
    code row i + ceil(K/2) (high nibble) — the two halves stay contiguous
    along K, so the fused kernel unpacks a tile with two masked shifts and
    NO sublane interleave, and the XLA fallback is one concatenate.
    """
    kk = codes.shape[0]
    k2 = -(-kk // 2)
    codes_p = jnp.pad(codes, ((0, 2 * k2 - kk), (0, 0)))
    nib = codes_p.astype(jnp.int32) & 0xF
    return (nib[:k2] | (nib[k2:] << 4)).astype(jnp.uint8)


def unpack_int4(packed, k: int):
    """Inverse of :func:`pack_int4`: (ceil(K/2), N) uint8 -> (K, N) int8.

    Pure jnp bit-ops — runs under jit/GSPMD and inside Pallas kernels
    (Mosaic-supported ops only); the same expression is the fused int4
    kernel's in-VMEM decode.
    """
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = (((p >> 4) & 0xF) ^ 8) - 8
    return jnp.concatenate([lo, hi], axis=0)[:k].astype(jnp.int8)


def _explicit_conv_pads(spatial_in, kernel_spatial, window_strides, padding,
                        lhs_dilation, rhs_dilation):
    """Resolve string padding to explicit (lo, hi) pairs on the (possibly
    input-dilated) spatial dims, matching XLA conv semantics."""
    if not isinstance(padding, str):
        return [tuple(p) for p in padding]
    ld = lhs_dilation or (1,) * len(spatial_in)
    rd = rhs_dilation or (1,) * len(spatial_in)
    dil_in = [(n - 1) * d + 1 if n > 0 else 0 for n, d in zip(spatial_in, ld)]
    k_eff = [(k - 1) * d + 1 for k, d in zip(kernel_spatial, rd)]
    return lax.padtype_to_pads(dil_in, k_eff, window_strides, padding)


def quantized_conv_int8(x_codes, w_codes, sx, scale, cx, wsum, *,
                        window_strides, padding, lhs_dilation, rhs_dilation,
                        dimension_numbers, feature_group_count=1,
                        zp=None, bias=None, out_dtype=jnp.float32,
                        as_affine=False):
    """Native int8 convolution (VERDICT r2 next #3): code conv accumulates
    exactly in int32 on the 2x-rate int8 MXU, then one f32 scale epilogue.

    Activation values are ``sx * (c - cx)`` with integer ``cx`` (0 for
    signed-symmetric sites; -128 for unsigned/asymmetric — e.g. every
    ReLU-fed site that calibrated unsigned). Padding and input dilation are
    materialized EXPLICITLY with fill code ``cx`` (one ``lax.pad``), so a
    padded tap contributes exactly value 0 and the zero-point corrections
    stay position-independent rank-1 terms:

      out = sx*sw_n * [ dot - cx*Wsum_n - cw_n*Xsum(m) + K*cx*cw_n ]

    ``zp`` is the per-out-channel weight zero point in [0,255] coords for
    unsigned-calibrated channels (``cw = zp - 128``); its Xsum term is a
    per-group window-sum of the padded codes (a ones-kernel int8 conv),
    skipped statically for signed-symmetric weights.

    x_codes: (B, *S, I) int8; w_codes: (*K, I/g, O) int8; scale: (O,) f32;
    cx: () f32 integer-valued; wsum: (O,) int32 per-channel code sums.

    ``as_affine`` (fused-boundary serving, ``QuantPhase.chained`` on conv
    models): return a pending :class:`~..quant.sites.Affine` instead of the
    materialized f32 result — the rank-1 epilogue constants fold into O(C)
    vector math and the element loop shrinks to the int32->f32 cast (plus
    the Xsum tensor term for unsigned-weight layers); BN / activation /
    the next act site fold on top (same value up to f32 constant-folding
    ULPs — see ``Affine``).
    """
    n_spatial = len(w_codes.shape) - 2
    spatial_in = x_codes.shape[1:1 + n_spatial]
    kernel_spatial = w_codes.shape[:-2]
    pads = _explicit_conv_pads(spatial_in, kernel_spatial, window_strides,
                               padding, lhs_dilation, rhs_dilation)
    ld = lhs_dilation or (1,) * n_spatial
    cx_code = cx.astype(jnp.int8)  # integer by construction, in [-128, 127]
    pad_cfg = ([(0, 0, 0)]
               + [(lo, hi, d - 1) for (lo, hi), d in zip(pads, ld)]
               + [(0, 0, 0)])
    xp = lax.pad(x_codes, cx_code, pad_cfg)
    acc = lax.conv_general_dilated(
        xp, w_codes,
        window_strides=window_strides,
        padding=[(0, 0)] * n_spatial,
        rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    def _xsum_term():
        g = feature_group_count
        in_per_g = w_codes.shape[-2]
        ones = jnp.ones((*kernel_spatial, in_per_g, g), jnp.int8)
        xsum = lax.conv_general_dilated(
            xp, ones,
            window_strides=window_strides, padding=[(0, 0)] * n_spatial,
            rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers, feature_group_count=g,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                       # (B, *S_out, g)
        # repeat each group's window-sum across its contiguous output
        # channels (XLA grouped-conv channel ordering), times cw = zp - 128
        o_per_g = w_codes.shape[-1] // g
        cw = zp - 128.0
        k_taps = math.prod(kernel_spatial) * in_per_g
        return jnp.repeat(xsum, o_per_g, axis=-1) * cw, (k_taps * cx) * cw

    if as_affine:
        from ..quant.sites import Affine

        x_t = acc.astype(jnp.float32)
        sc = sx * scale                              # (O,)
        b = -(cx * wsum.astype(jnp.float32)) * sc    # (O,)
        if zp is not None:
            xs, const = _xsum_term()
            x_t = x_t - xs
            b = b + const * sc
        if bias is not None:
            b = b + bias
        return Affine(x_t, sc, b)

    out = acc.astype(jnp.float32) - cx * wsum.astype(jnp.float32)
    if zp is not None:  # static: symmetric-signed weights skip entirely
        xs, const = _xsum_term()
        out = out - xs
        out = out + const
    out = out * (sx * scale)
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


def quantized_matmul_int8(x_codes, w: Int8Weights, sx, cx, *,
                          bias=None, out_dtype=jnp.float32,
                          w_has_zp: bool = False, acc=None):
    """``(sx*(x-cx)) @ (sw*(w-cw))`` on the native int8 MXU (2x bf16 on v5e).

    The integer dot accumulates exactly in int32 (no float rounding per
    product, unlike the simulated path's f32 MXU dot); zero points unfold as
    rank-1 corrections:

      out = sx*sw_n * [ dot_mn - cx*Wsum_n - cw_n*Xsum_m + K*cx*cw_n ]

    x_codes: (M, K) int8 from ``quantize_acts_int8``; sx/cx scalars.
    ``acc``: optional precomputed int32 dot (e.g. the fused int4 Pallas
    kernel's output) — ``w.codes`` is then unused.
    """
    k = x_codes.shape[-1]
    if acc is None:
        acc = jnp.dot(x_codes, w.codes, preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) - cx * w.wsum.astype(jnp.float32)[None, :]
    if w_has_zp:  # static: only asymmetric weights need the Xsum correction
        cw = w.zp - 128.0
        xsum = jnp.sum(x_codes.astype(jnp.int32), axis=-1, keepdims=True)
        out = out - cw[None, :] * xsum.astype(jnp.float32)
        out = out + (k * cx) * cw[None, :]
    out = out * (sx * w.scale)[None, :]
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


# --------------------------------------------------------------------------
# Packed-FP8 serving: real 1-byte weight storage (see pallas/dequant_matmul)
# --------------------------------------------------------------------------

def _walk_cache(cache_node, quant_node, path, visit):
    if not isinstance(cache_node, dict):
        return
    if "w_q" in cache_node:
        visit(cache_node, quant_node, path)
        return
    for key, child in cache_node.items():
        qchild = quant_node.get(key, {}) if isinstance(quant_node, dict) else {}
        _walk_cache(child, qchild, path + (key,), visit)


def pack_dense_caches(variables, qc: QuantConfig,
                      n_bits_w: Optional[int] = None):
    """Install 1-byte packed weight codes for every cached dense layer.

    Walks the ``quant_cache`` collection (built by a ``cache_weights`` pass)
    and, for each 2-D quantized kernel, installs the byte representation the
    ``qp.packed`` apply path consumes:

    * FP quantizer: ``w_codes`` (uint8 ExMy codes) + ``w_pack_bias`` (int32
      per-channel packing bias), decoded in VMEM by the fused Pallas
      dequant-matmul kernel. Layers whose quantizer state disagrees with the
      static config (e.g. FP_MSE elected different mantissa bits) are
      skipped — the packed apply would decode them with the wrong format.
    * uniform quantizers (n_bits <= 8): ``w_i8``/``w_i8_scale``/``w_i8_zp``/
      ``w_i8_sum`` native int8 codes for the int8 MXU path
      (``quantized_matmul_int8`` — 2x bf16 matmul throughput on v5e).

    Returns ``(variables, report)``; ``report`` maps layer paths to the
    fraction of channels packed bit-exactly (always 1.0 for uniform; for FP
    see ``pack_weights`` — the STE grid's rounded bias can overflow the
    8-bit field, in which case the channel re-quantizes onto the true-8-bit
    ``bias - 1`` grid).
    """
    import flax

    from ..quant.quantizers import _uniform_scale
    from .pallas.dequant_matmul import pack_weights

    wq_cfg = qc.weight_quantizer(n_bits_w)
    is_fp = wq_cfg.method == QMethod.fp_quantizer
    mant = int(wq_cfg.fp8.mantissa_bits) if is_fp else 0

    variables = flax.core.unfreeze(variables)
    report = {}

    def visit_fp(node, state, path, n_bits):
        w_q, w_bias = node.get("w_q"), node.get("w_bias")
        if w_bias is None or w_bias.size == 0:
            return
        expo = n_bits - 1 - mant
        if expo < 1 or 1 + expo + mant > 8:
            return  # this layer's format doesn't fit a byte; leave unpacked
        mbits = state.get("mantissa_bits")
        sbits = state.get("sign_bits")
        if (mbits is None or int(jnp.round(mbits[0])) != mant
                or sbits is None or int(sbits[0]) != 1):
            return
        # conv kernels (*K, I, O) pack in the flattened (prod(K)*I, O)
        # layout; the conv apply reshapes the decoded weights back
        w2 = jnp.asarray(w_q, jnp.float32).reshape(-1, w_q.shape[-1])
        pw = pack_weights(w2, w_bias, expo, mant)
        node["w_codes"] = pw.codes
        node["w_pack_bias"] = pw.bias
        report["/".join(path)] = float(pw.exact_fraction)

    def visit_int8(node, state, path, n_bits):
        if n_bits > 8:
            return
        w_q = jnp.asarray(node["w_q"], jnp.float32)
        delta = state.get("delta")
        if delta is None:
            return
        n = w_q.shape[-1]
        # conv kernels (*K, I, O) quantize in the flattened (prod(K)*I, O)
        # layout (per-channel params live on the last axis either way)
        w2 = w_q.reshape(-1, n)
        scale = jnp.broadcast_to(
            _uniform_scale(wq_cfg, jnp.asarray(delta, jnp.float32)), (n,))
        if wq_cfg.method == QMethod.symmetric_uniform:
            signed = bool(int(state["signed"][0]))
            zp_q = jnp.zeros((n,), jnp.float32)
            shift = 0.0 if signed else (8.0 if n_bits <= 4 else 128.0)
        else:
            zp_q = jnp.broadcast_to(jnp.round(
                jnp.asarray(state["zero_float"], jnp.float32)), (n,))
            zp_q = jnp.clip(zp_q, 0.0, 2.0 ** n_bits - 1)
            shift = 8.0 if n_bits <= 4 else 128.0
        x_int = jnp.round(w2 / scale[None, :]) + zp_q[None, :]
        codes = (x_int - shift).astype(jnp.int8)
        # stored zp in shifted coords: c_w = zp - 128 (0 for signed
        # symmetric). Installed ONLY when some channel's c_w is nonzero —
        # key presence is static under jit, so symmetric-signed layers
        # statically elide the whole Xsum correction (an extra (M, K)
        # reduction per dense that round-1 paid unconditionally).
        zp_st = zp_q + (128.0 - shift)
        if n_bits <= 4:
            node["w_i4"] = pack_int4(codes)
            node["w_i4_scale"] = scale
            if bool(jnp.any(zp_st != 128.0)):
                node["w_i4_zp"] = zp_st
            node["w_i4_sum"] = jnp.sum(codes.astype(jnp.int32), axis=0)
        else:
            # conv layers keep kernel-shaped codes (the int8 conv consumes
            # them directly); dense layers keep the (K, N) layout
            node["w_i8"] = codes.reshape(w_q.shape)
            node["w_i8_scale"] = scale
            if bool(jnp.any(zp_st != 128.0)):
                node["w_i8_zp"] = zp_st
            node["w_i8_sum"] = jnp.sum(codes.astype(jnp.int32), axis=0)
        # exactness: int codes reproduce the cached fake-quantized weights
        rt = scale[None, :] * (codes.astype(jnp.float32) + shift - zp_q)
        report["/".join(path)] = float(jnp.mean(
            jnp.all(rt == w2, axis=0).astype(jnp.float32)))

    def visit(node, qnode, path):
        w_q = node.get("w_q")
        if w_q is None or w_q.ndim < 2:
            return
        if w_q.ndim > 2 and not is_fp:
            # conv int8 codes are only consumed when the act site is a
            # per-tensor uniform quantizer over quantized inputs; otherwise
            # the layer falls back to the simulation and would need its
            # (stripped) kernel
            acfg = qc.act_quantizer()
            if (acfg.method == QMethod.fp_quantizer or acfg.per_channel
                    or not qc.quantize_input):
                return
        state = (qnode.get("weight_quantizer", {}) or {}).get("q", {})
        # per-layer n_bits recorded at cache time (quant_setup variants
        # override n_bits_w per layer); fall back to the global config
        fmt = node.get("w_nbits")
        n_bits = int(fmt[0]) if fmt is not None else wq_cfg.n_bits
        if is_fp:
            visit_fp(node, state, path, n_bits)
        else:
            visit_int8(node, state, path, n_bits)

    _walk_cache(variables.get("quant_cache", {}), variables.get("quant", {}),
                (), visit)
    return variables, report


def strip_packed_params(variables):
    """Drop the f32 kernels and bf16 weight caches of packed layers.

    After ``pack_dense_caches``, a packed-phase apply never requests the
    ``kernel`` param or the ``w_q``/``w_bias`` cache entries of a layer that
    has ``w_codes`` — removing them cuts resident weight HBM to the 1-byte
    codes (~6x vs f32+bf16). The stripped variables only work with
    ``qp.packed`` phases; re-calibration needs the originals.
    """
    import flax

    variables = flax.core.unfreeze(variables)

    def visit(node, _qnode, path):
        if ("w_codes" not in node and "w_i8" not in node
                and "w_i4" not in node):
            return
        node.pop("w_q", None)
        node.pop("w_bias", None)
        pnode = variables.get("params", {})
        for key in path:
            pnode = pnode.get(key, {}) if isinstance(pnode, dict) else {}
        if isinstance(pnode, dict):
            pnode.pop("kernel", None)

    _walk_cache(variables.get("quant_cache", {}), {}, (), visit)
    return variables
