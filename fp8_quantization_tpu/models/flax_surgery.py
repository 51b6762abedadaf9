"""Generalized surgery: quantize an ARBITRARY flax model by interception.

The reference can quantize any torch model via recursive module-tree rewrite
(``quantize_model``/``quantize_sequential`` with ``specials`` hooks,
`/root/reference/quantization/autoquant_utils.py:292-387`). The spec-based
``models/surgery.py`` covers sequential models; this module covers the
general case with flax's idiomatic analog of forward-hijacking:
``nn.intercept_methods``. Wrapping a foreign module in
``QuantizedFlaxModel`` intercepts every ``nn.Dense`` / ``nn.Conv`` /
``nn.LayerNorm`` call inside it and runs the framework's full hijacker
forward protocol (hijacker.py:77-115) in its place — input-quant →
weight-quant → op → res-quant → approx/qama rerun → output-quant — with the
QuantSites attached under the intercepted module's own scope, so the quant
state lands exactly where the params live
(``quant/<path>/activation_quantizer/...``).

Placement note: the reference fuses a *following* activation into the
hijacked layer and quantizes after it. Interception cannot see the caller's
next op, so with ``quantize_input=False`` the output site quantizes the raw
layer output (pre-activation). The canonical configs (image_net.sh) run
``--quantize-input``, where behavior is identical.

``specials`` maps module types to custom intercept functions — the analog of
the reference's ``specials`` dict; ``filter_fn(path, module)`` excludes
layers from quantization (the ``quant_setup``-style first/last-layer
exceptions).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple, Type

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..config import QuantConfig
from ..ops.layers import (
    approx_matmul_2d,
    conv_patches,
    default_fp_bias,
    qama_matmul_2d,
)
from ..quant.sites import FIXED, QuantPhase, QuantSite


# ---------------------------------------------------------------------------
# Protocol pieces (operating on a foreign bound module)
# ---------------------------------------------------------------------------


def _make_sites(qc: QuantConfig, mod: nn.Module):
    """The three QuantSites, attached under the intercepted module's scope
    (hijacker.py:50-75; same names as ops/layers.py so checkpoints align)."""
    act = QuantSite(qc.act_quantizer(), qc.act_range,
                    name="activation_quantizer", parent=mod)
    res = QuantSite(qc.act_quantizer(), qc.act_range,
                    name="res_quantizer", parent=mod)
    weight = QuantSite(qc.weight_quantizer(), qc.weight_range,
                       channel_axis=-1, name="weight_quantizer", parent=mod)
    return act, res, weight


def _quant_in(qc, act_site, x, qp: QuantPhase):
    a_bias = None
    if qc.quantize_input and qp.quant_a:
        x, a_bias = act_site(x, qp, with_bias=True)
    return x, a_bias


def _quant_weight(qc, mod, weight_site, kernel, qp: QuantPhase):
    """Weight quantization with the frozen-weight cache
    (ops/layers.py::_QuantOpBase._quant_weight semantics)."""
    if not qp.quant_w:
        return kernel, None
    if qp.cache_weights:
        w, w_bias = weight_site(kernel, qp, with_bias=True)
        wb = w_bias if w_bias is not None else jnp.zeros((0,), jnp.float32)
        cw = mod.variable("quant_cache", "w_q", lambda: w)
        cb = mod.variable("quant_cache", "w_bias", lambda: wb)
        if mod.is_mutable_collection("quant_cache"):
            cw.value, cb.value = w, wb
        return w, w_bias
    if not qp.estimating and mod.has_variable("quant_cache", "w_q"):
        w = mod.get_variable("quant_cache", "w_q")
        wb = mod.get_variable("quant_cache", "w_bias")
        return w, (wb if wb.size else None)
    return weight_site(kernel, qp, with_bias=True)


def _special_armed(qc) -> bool:
    rm = qc.run_method
    return rm.res_quantizer_flag and (rm.approx_flag or
                                      rm.quantize_after_mult_and_add)


def _plain_first(qc, qp: QuantPhase) -> bool:
    rm = qc.run_method
    return qp.estimating or rm.original_quantize_res or not _special_armed(qc)


def _special_matmul(qc, res_site, x2d, w2d, a_bias, w_bias):
    rm = qc.run_method
    if rm.quantize_after_mult_and_add:
        return qama_matmul_2d(x2d, w2d, lambda t: res_site(t, FIXED))
    approx = qc.approx
    a_b = a_bias if a_bias is not None else default_fp_bias(approx)
    r_bias = res_site.fp_bias()
    r_b = r_bias if r_bias is not None else default_fp_bias(approx)
    if w_bias is None:
        raise ValueError("approx path requires quantized weights")
    return approx_matmul_2d(x2d, w2d, a_b[0], w_bias, r_b[0], approx)


def _tail(qc, act_site, res, qp: QuantPhase):
    if not qc.quantize_input and qp.quant_a:
        res = act_site(res, qp)
    return res


# ---------------------------------------------------------------------------
# Per-layer intercept functions
# ---------------------------------------------------------------------------


def _dense_forward(qc: QuantConfig, mod: nn.Dense, x, qp: QuantPhase):
    """Quantized stand-in for ``nn.Dense.__call__`` (QuantDense protocol)."""
    kernel = mod.param("kernel", mod.kernel_init,
                       (x.shape[-1], mod.features), mod.param_dtype)
    bias = (mod.param("bias", mod.bias_init, (mod.features,), mod.param_dtype)
            if mod.use_bias else None)
    act_site, res_site, weight_site = _make_sites(qc, mod)

    x, a_bias = _quant_in(qc, act_site, x, qp)
    w, w_bias = _quant_weight(qc, mod, weight_site, kernel, qp)

    res = None
    if _plain_first(qc, qp):
        res = x @ w
        if bias is not None:
            res = res + bias
        if qc.quantize_input and qp.quant_a and qc.run_method.res_quantizer_flag:
            res = res_site(res, qp)
    if _special_armed(qc):
        x2d = x.reshape(-1, x.shape[-1])
        out2d = _special_matmul(qc, res_site, x2d, w, a_bias, w_bias)
        res = out2d.reshape(*x.shape[:-1], mod.features)
        if bias is not None:
            res = res + bias
    return _tail(qc, act_site, res, qp)


def _tuple2(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _conv_forward(qc: QuantConfig, mod: nn.Conv, x, qp: QuantPhase):
    """Quantized stand-in for 2-D ``nn.Conv.__call__`` (QuantConv protocol).
    NHWC/HWIO (flax defaults)."""
    kh, kw = mod.kernel_size
    g = mod.feature_group_count
    in_ch = x.shape[-1]
    kernel_shape = (kh, kw, in_ch // g, mod.features)
    kernel = mod.param("kernel", mod.kernel_init, kernel_shape,
                       mod.param_dtype)
    bias = (mod.param("bias", mod.bias_init, (mod.features,), mod.param_dtype)
            if mod.use_bias else None)
    strides = _tuple2(mod.strides or 1)
    dilation = _tuple2(mod.kernel_dilation or 1)
    act_site, res_site, weight_site = _make_sites(qc, mod)

    x, a_bias = _quant_in(qc, act_site, x, qp)
    w, w_bias = _quant_weight(qc, mod, weight_site, kernel, qp)

    res = None
    if _plain_first(qc, qp):
        res = lax.conv_general_dilated(
            x, w, window_strides=strides, padding=mod.padding,
            rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g,
        )
        if bias is not None:
            res = res + bias
        if qc.quantize_input and qp.quant_a and qc.run_method.res_quantizer_flag:
            res = res_site(res, qp)
    if _special_armed(qc):
        if g != 1:
            raise NotImplementedError(
                "approx/qama special paths for grouped foreign convs: use "
                "models/surgery.py or ops.layers.QuantConv directly")
        patches = conv_patches(x, kernel_shape, strides, mod.padding, dilation)
        b_sp, oh, ow, _ = patches.shape
        p2d = patches.reshape(b_sp * oh * ow, kh * kw * in_ch)
        w2d = w.reshape(kh * kw * in_ch, mod.features)
        out2d = _special_matmul(qc, res_site, p2d, w2d, a_bias, w_bias)
        res = out2d.reshape(b_sp, oh, ow, mod.features)
        if bias is not None:
            res = res + bias
    return _tail(qc, act_site, res, qp)


def _layernorm_forward(qc: QuantConfig, mod: nn.LayerNorm, x, qp: QuantPhase):
    """Quantized stand-in for ``nn.LayerNorm.__call__`` (QuantLayerNorm
    protocol: scale quantized as the weight, autoquant_utils.py:60-91)."""
    features = x.shape[-1]
    act_site, _, weight_site = _make_sites(qc, mod)

    x, _ = _quant_in(qc, act_site, x, qp)
    # mirror nn.LayerNorm's own statistics settings bit-for-bit
    mean = jnp.mean(x, axis=-1, keepdims=True)
    if getattr(mod, "use_fast_variance", False):
        var = jnp.maximum(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean),
            0.0)
    else:
        var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + mod.epsilon)
    if mod.use_scale:
        scale = mod.param("scale", mod.scale_init, (features,),
                          mod.param_dtype)
        if qp.quant_w:
            scale = weight_site(scale, qp)
        y = y * scale
    if mod.use_bias:
        y = y + mod.param("bias", mod.bias_init, (features,), mod.param_dtype)
    return _tail(qc, act_site, y, qp)


_DEFAULT_HANDLERS: Dict[Type[nn.Module], Callable] = {
    nn.Dense: _dense_forward,
    nn.Conv: _conv_forward,
    nn.LayerNorm: _layernorm_forward,
}


# ---------------------------------------------------------------------------
# The wrapper module
# ---------------------------------------------------------------------------


class QuantizedFlaxModel(nn.Module):
    """Quantize an arbitrary flax model by call interception.

    ``filter_fn(path, module) -> bool`` returns False to leave a layer
    unquantized (path is the '/'-joined module path). ``specials`` adds or
    overrides handlers per module type: ``{MyBlock: fn(qc, mod, x, qp)}``.
    """

    qc: QuantConfig
    model: nn.Module
    filter_fn: Optional[Callable[[str, nn.Module], bool]] = None
    specials: Optional[Dict[Type[nn.Module], Callable]] = None

    def _interceptor(self, qp: QuantPhase):
        handlers = dict(_DEFAULT_HANDLERS)
        if self.specials:
            handlers.update(self.specials)

        def interceptor(next_fn, args, kwargs, context):
            mod = context.module
            handler = handlers.get(type(mod))
            if handler is None or context.method_name != "__call__":
                return next_fn(*args, **kwargs)
            path = "/".join(str(p) for p in mod.path)
            if self.filter_fn is not None and not self.filter_fn(path, mod):
                return next_fn(*args, **kwargs)
            return handler(self.qc, mod, args[0], qp)

        return interceptor

    @nn.compact
    def __call__(self, *args, qp: QuantPhase = FIXED, **kwargs):
        with nn.intercept_methods(self._interceptor(qp)):
            return self.model(*args, **kwargs)


def quantize_flax_model(model: nn.Module, qc: QuantConfig,
                        filter_fn=None, specials=None) -> QuantizedFlaxModel:
    """``quantize_model`` analog (autoquant_utils.py:348-387) for arbitrary
    flax modules."""
    return QuantizedFlaxModel(qc=qc, model=model, filter_fn=filter_fn,
                              specials=specials)
