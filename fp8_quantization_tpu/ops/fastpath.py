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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

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
    and, for each 2-D FP-quantized kernel, adds ``w_codes`` (uint8 ExMy
    codes) + ``w_pack_bias`` (int32 per-channel packing bias) next to the
    existing ``w_q``. Layers whose quantizer state disagrees with the static
    config (e.g. FP_MSE elected different mantissa bits) are skipped — the
    packed apply path would decode them with the wrong format.

    Returns ``(variables, report)``; ``report`` maps layer paths to the
    fraction of channels packed bit-exactly (see ``pack_weights`` — the STE
    grid's rounded bias can overflow the 8-bit field, in which case the
    channel re-quantizes onto the true-8-bit ``bias - 1`` grid).
    """
    import flax

    from .pallas.dequant_matmul import pack_weights

    wq_cfg = qc.weight_quantizer(n_bits_w)
    if wq_cfg.method != QMethod.fp_quantizer:
        raise ValueError("packed serving supports the FP quantizer only")
    mant = int(wq_cfg.fp8.mantissa_bits)
    expo = wq_cfg.n_bits - 1 - mant
    if 1 + expo + mant > 8:
        raise ValueError(f"format E{expo}M{mant}+sign does not fit in 8 bits")

    variables = flax.core.unfreeze(variables)
    report = {}

    def visit(node, qnode, path):
        w_q = node.get("w_q")
        w_bias = node.get("w_bias")
        if w_q is None or w_q.ndim != 2 or w_bias is None or w_bias.size == 0:
            return
        state = (qnode.get("weight_quantizer", {}) or {}).get("q", {})
        mbits = state.get("mantissa_bits")
        sbits = state.get("sign_bits")
        if (mbits is None or int(jnp.round(mbits[0])) != mant
                or sbits is None or int(sbits[0]) != 1):
            return
        pw = pack_weights(jnp.asarray(w_q, jnp.float32), w_bias, expo, mant)
        node["w_codes"] = pw.codes
        node["w_pack_bias"] = pw.bias
        report["/".join(path)] = float(pw.exact_fraction)

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
        if "w_codes" not in node:
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
