"""Functional quantizers: state pytrees + pure apply / set_quant_range.

TPU-native replacement for the reference's stateful quantizer nn.Modules
(`/root/reference/quantization/quantizers/`): each quantizer is a dict-of-
arrays state plus pure functions, so calibration and inference are jittable
passes and the state lives in a flax variable collection.

* FP quantizer       ~ ``FPQuantizer``             (fp8_quantizer.py:191-319)
* symmetric uniform  ~ ``SymmetricUniformQuantizer`` (uniform_quantizers.py:259-331)
* asymmetric uniform ~ ``AsymmetricUniformQuantizer`` (uniform_quantizers.py:13-256)

Unlike the reference (channel-first only), a ``channel_axis`` selects which
axis per-channel parameters broadcast along, so flax-layout conv kernels
(H, W, I, O) quantize per-O without transposes.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..config import FP8Config, QMethod, QuantizerConfig
from ..numerics.fp8_ste import default_maxval, quantize_to_fp8_ste
from ..numerics.rounding import round_ste, scale_grad

QuantState = Dict[str, Any]

_EPS = 1e-8  # uniform_quantizers.py:36


def bcast_param(p, ndim: int, channel_axis: int):
    """Reshape a per-channel (C,) parameter for broadcast along ``channel_axis``."""
    p = jnp.asarray(p)
    if p.ndim == 0 or p.shape[0] == 1 or ndim <= 1:
        return p
    axis = channel_axis % ndim
    shape = [1] * ndim
    shape[axis] = -1
    return p.reshape(shape)


# --------------------------------------------------------------------------
# FP (ExMy) quantizer
# --------------------------------------------------------------------------

def fp_init(cfg: QuantizerConfig, num_channels: int = 1) -> QuantState:
    """Initial FP quantizer state (fp8_quantizer.py:196-234)."""
    fp8: FP8Config = cfg.fp8
    if fp8.maxval is not None:
        mv = float(fp8.maxval)
    else:
        mv = default_maxval(cfg.n_bits, fp8.mantissa_bits)
    n = num_channels if cfg.per_channel else 1
    return {
        "maxval": jnp.full((n,), mv, jnp.float32),
        "mantissa_bits": jnp.asarray([float(fp8.mantissa_bits)], jnp.float32),
        "sign_bits": jnp.asarray([1], jnp.int32),
    }


def fp_apply(cfg: QuantizerConfig, state: QuantState, x, channel_axis: int = 0
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize-dequantize; returns (result, derived exponent bias).

    The bias is the ``custom_bias`` the approx matmul consumes
    (fp8_quantizer.py:244-246).
    """
    maxval = bcast_param(state["maxval"], x.ndim, channel_axis)
    return quantize_to_fp8_ste(
        x, cfg.n_bits, maxval, state["mantissa_bits"], state["sign_bits"]
    )


def fp_apply_affine(cfg: QuantizerConfig, state: QuantState, aff,
                    channel_axis: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize a pending-:class:`~..quant.sites.Affine` value, folding the
    affine + clamp into the FP8 clip (VERDICT r4 next #6 — the FP analog of
    ``fold_quantize_affine``). Per-tensor sites only (the affine's constants
    ride the last axis; a per-channel maxval broadcasts on ``channel_axis``
    and would fight them — callers decode instead)."""
    from ..numerics.fp8_ste import quantize_to_fp8_ste_affine

    assert not cfg.per_channel
    return quantize_to_fp8_ste_affine(
        aff.x, aff.scale, aff.bias, aff.lo, aff.hi,
        cfg.n_bits, state["maxval"], state["mantissa_bits"],
        state["sign_bits"])


def fp_bias(cfg: QuantizerConfig, state: QuantState) -> jnp.ndarray:
    """Derived exponent bias without quantizing data (manager ``get_fp_bias``,
    quantization_manager.py:124-125)."""
    sign_b = state["sign_bits"].astype(jnp.float32)
    M = jnp.clip(round_ste(state["mantissa_bits"]), 1, cfg.n_bits - sign_b)
    E = cfg.n_bits - sign_b - M
    bias = 2.0**E - jnp.log2(state["maxval"]) + jnp.log2(2 - 2.0 ** (-M)) - 1
    return jnp.round(bias)


def fp_set_quant_range(cfg: QuantizerConfig, state: QuantState, x_min, x_max
                       ) -> QuantState:
    """(fp8_quantizer.py:268-287). Folds (min, max) into maxval when
    ``set_maxval``; flips to unsigned when allowed and the range is
    non-negative."""
    x_min = jnp.atleast_1d(jnp.asarray(x_min, jnp.float32))
    x_max = jnp.atleast_1d(jnp.asarray(x_max, jnp.float32))
    new = dict(state)
    if cfg.fp8.allow_unsigned:
        unsigned = jnp.all(x_min >= 0)
        new["sign_bits"] = jnp.where(unsigned, 0, 1)[None].astype(jnp.int32)
    if cfg.fp8.set_maxval:
        mx = jnp.abs(jnp.maximum(jnp.abs(x_min), x_max))
        new["maxval"] = mx.reshape(state["maxval"].shape)
    return new


# --------------------------------------------------------------------------
# Uniform quantizers
# --------------------------------------------------------------------------

def uniform_init(cfg: QuantizerConfig, num_channels: int = 1) -> QuantState:
    n = num_channels if cfg.per_channel else 1
    return {
        "delta": jnp.ones((n,), jnp.float32),
        "zero_float": jnp.zeros((n,), jnp.float32),
        "signed": jnp.asarray([1], jnp.int32),  # symmetric only
    }


def _uniform_scale(cfg: QuantizerConfig, delta):
    if cfg.scale_domain == "linear":
        return jnp.maximum(delta, _EPS)  # uniform_quantizers.py:90
    return jnp.exp(delta)  # log domain, :92


def _sym_int_bounds(cfg: QuantizerConfig, signed):
    signed_f = signed.astype(jnp.float32)
    int_min = -(2.0 ** (cfg.n_bits - 1)) * signed_f
    int_max = 2.0 ** (cfg.n_bits - signed_f) - 1
    return int_min, int_max


def uniform_apply(cfg: QuantizerConfig, state: QuantState, x,
                  channel_axis: int = 0, grad_scaling: bool = False):
    """STE fake-quantize (uniform_quantizers.py:108-164, 259-331)."""
    symmetric = cfg.method == QMethod.symmetric_uniform
    delta = bcast_param(state["delta"], x.ndim, channel_axis)
    scale = _uniform_scale(cfg, delta)

    if symmetric:
        int_min, int_max = _sym_int_bounds(cfg, state["signed"])
        zero_point = 0.0
    else:
        int_min, int_max = 0.0, 2.0**cfg.n_bits - 1
        zp = round_ste(bcast_param(state["zero_float"], x.ndim, channel_axis))
        zero_point = jnp.clip(zp, int_min, int_max)

    if grad_scaling:
        # LSQ grad scale (uniform_quantizers.py:120-128,166-173)
        num_elements = x.size / (x.shape[channel_axis % x.ndim] if cfg.per_channel else 1)
        gs = (jnp.mean(int_max) * num_elements) ** -0.5
        scale = scale_grad(scale, gs)
        if not symmetric:
            zero_point = scale_grad(zero_point, gs)

    x_int = jnp.clip(round_ste(x / scale) + zero_point, int_min, int_max)
    return scale * (x_int - zero_point)


def uniform_set_quant_range(cfg: QuantizerConfig, state: QuantState, x_min, x_max
                            ) -> QuantState:
    """(uniform_quantizers.py:220-240, 303-314)."""
    x_min = jnp.atleast_1d(jnp.asarray(x_min, jnp.float32))
    x_max = jnp.atleast_1d(jnp.asarray(x_max, jnp.float32))
    # _tensorize_min_max (:189-218): force zero in range, avoid div-by-zero
    x_min = jnp.minimum(x_min, 0.0)
    x_max = jnp.maximum(x_max, _EPS)

    new = dict(state)
    if cfg.method == QMethod.symmetric_uniform:
        signed = (jnp.min(x_min) < 0).astype(jnp.int32)[None]
        _, int_max = _sym_int_bounds(cfg, signed)
        x_absmax = jnp.maximum(jnp.abs(x_min), x_max)
        delta = x_absmax / int_max
        new["signed"] = signed
    else:
        int_max = 2.0**cfg.n_bits - 1
        delta = (x_max - x_min) / int_max
        new["zero_float"] = (-x_min / delta).reshape(state["zero_float"].shape)
    if cfg.scale_domain == "log":
        delta = jnp.log(delta)
    new["delta"] = delta.reshape(state["delta"].shape)
    return new


# --------------------------------------------------------------------------
# Dispatch
# --------------------------------------------------------------------------

def init(cfg: QuantizerConfig, num_channels: int = 1) -> QuantState:
    if cfg.method == QMethod.fp_quantizer:
        return fp_init(cfg, num_channels)
    return uniform_init(cfg, num_channels)


def apply(cfg: QuantizerConfig, state: QuantState, x, channel_axis: int = 0,
          grad_scaling: bool = False):
    """Quantize-dequantize ``x``; returns just the tensor."""
    if cfg.method == QMethod.fp_quantizer:
        y, _ = fp_apply(cfg, state, x, channel_axis)
        return y
    return uniform_apply(cfg, state, x, channel_axis, grad_scaling)


def set_quant_range(cfg: QuantizerConfig, state: QuantState, x_min, x_max
                    ) -> QuantState:
    if cfg.method == QMethod.fp_quantizer:
        return fp_set_quant_range(cfg, state, x_min, x_max)
    return uniform_set_quant_range(cfg, state, x_min, x_max)
