"""QuantSite: one quantized tensor site (act / weight / res) as a flax module.

TPU-native replacement for the reference's ``QuantizationManager`` + the
``Qstates`` mutable state machine
(`/root/reference/quantization/quantization_manager.py:28-139`): instead of a
mode flag mutated on a module, the *call* carries a phase:

* ``phase="estimate"`` — fold the batch into the range-estimator state,
  derive ranges, update quantizer params, then quantize
  (manager.forward:114-122). Requires the ``quant``/``quant_est`` collections
  to be mutable in ``Module.apply``.
* ``phase="fixed"``   — quantize with frozen params (Qstates.fix_ranges).

Calibrate-then-freeze is therefore a pure function from (variables, batches)
to new variables — jittable, shardable, checkpointable as a pytree.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import flax.struct
import jax.numpy as jnp
from jax import lax

from ..config import EstimatorConfig, QMethod, QuantizerConfig
from . import estimators, quantizers


class Coded(NamedTuple):
    """Activations as int8 codes on a frozen per-tensor uniform grid.

    The chained serving currency (``QuantPhase.chained``): instead of a
    fake-quantized f32 tensor (4 B/element of HBM traffic between every
    layer), a site emits ``codes`` with ``value = scale * (codes - cx)`` —
    1 B/element. ``decoded(Coded)`` reproduces the fake-quant output
    BIT-EXACTLY (codes and cx are small integers, exact in f32, and the
    final multiply is the same op ``uniform_apply`` ends with), so chained
    logits match the unchained packed path exactly.
    """

    codes: jnp.ndarray   # int8, the tensor
    scale: jnp.ndarray   # f32 scalar
    cx: jnp.ndarray      # f32 scalar: effective zero point in code coords

    def reshape(self, *shape):
        """Shape ops act on the codes (per-tensor scale/cx unaffected)."""
        return self._replace(codes=self.codes.reshape(*shape))


class CodedFP(flax.struct.PyTreeNode):
    """Activations as 1-byte ExMy codes on a frozen per-tensor FP grid.

    The FP8 chained serving currency (VERDICT r2 next #4) — the FP analog of
    :class:`Coded`: ``value = unpack_exmy_bits(codes, bias)``. Packing uses
    the site's safe packing bias (``fp_pack_bias``): bit-exact with the
    fake-quantized values when the STE grid fits the byte field, else the
    channel re-quantizes onto the ``bias - 1`` grid moving only
    bottom-binade subnormals by <= half their ULP — the exact contract of
    ``pack_weights`` / the packed KV cache.
    """

    codes: jnp.ndarray   # uint8 ExMy codes (s:1|e:E|m:M)
    bias: jnp.ndarray    # () int32 packing bias
    expo_width: int = flax.struct.field(pytree_node=False)
    mant_width: int = flax.struct.field(pytree_node=False)

    def reshape(self, *shape):
        """Shape ops act on the codes (per-tensor bias unaffected)."""
        return self.replace(codes=self.codes.reshape(*shape))


class Affine(flax.struct.PyTreeNode):
    """A tensor with a pending per-channel affine + clamp: the value is
    ``clip(x * scale + bias, lo, hi)`` (clip skipped when ``lo``/``hi`` are
    None), with ``scale``/``bias`` broadcast on the LAST axis.

    The fused-boundary currency of int8 CNN serving (``QuantPhase.chained``
    on conv models, VERDICT r3 next #1): everything between a conv's int32
    accumulator and the next layer's activation quantizer is affine-and-clamp
    — the dequant epilogue (per-channel scale, zero-point offset), the
    inference BatchNorm, and ReLU/ReLU6. Instead of evaluating ~15 tensor
    ops' worth of chain per element, the producer hands the RAW tensor plus
    folded per-channel constants forward; the consumer's uniform act site
    folds the whole thing into its own quantization:

      codes = clip(round(x*(scale/s) + (bias/s + zp)), lo', hi')

    — one mul, one add, one round, one clip per element, with the clamp
    merged EXACTLY into integer bounds (``round(clip(v,l,h)/s+zp)`` equals
    ``clip(round(v/s+zp), round(l/s+zp), round(h/s+zp))`` for integer
    ``zp`` by monotonicity of round). The folded per-channel constants are
    O(C) vector math, hoisted out of the element loop.

    Value contract: equal to evaluating the chain sequentially up to f32
    constant-folding rounding (±1 ULP before each round — the same order of
    deviation the exact-int32-accumulation serving path already carries vs
    the f32 simulation). Exact when scales/stats are powers of two (tested).
    """

    x: jnp.ndarray
    scale: jnp.ndarray                 # (C,) or scalar f32
    bias: jnp.ndarray                  # (C,) or scalar f32
    lo: "jnp.ndarray | None" = None    # () f32, clamp on the POST-affine value
    hi: "jnp.ndarray | None" = None

    @property
    def shape(self):
        return self.x.shape

    @property
    def dtype(self):
        return jnp.float32

    def reshape(self, *shape):
        """Leading-dim reshapes only (per-channel constants ride the last
        axis)."""
        y = self.x.reshape(*shape)
        assert y.shape[-1] == self.x.shape[-1], (y.shape, self.x.shape)
        return self.replace(x=y)

    def then_affine(self, s2, b2):
        """Compose ``v*s2 + b2`` AFTER this affine (requires no clamp set —
        in the conv serving chain the activation clamp is always set last)."""
        assert self.lo is None and self.hi is None
        return Affine(self.x, self.scale * s2, self.bias * s2 + b2)

    def with_clamp(self, lo, hi):
        assert self.lo is None and self.hi is None
        return self.replace(
            lo=None if lo is None else jnp.float32(lo),
            hi=None if hi is None else jnp.float32(hi))


def decoded(x, dtype=jnp.float32):
    """Materialize a ``Coded``/``CodedFP``/``Affine`` back to values;
    identity for arrays.

    XLA fuses this into the consuming elementwise op / matmul prologue, so
    the float form never round-trips HBM — the read stays 1 B/element.
    """
    if isinstance(x, Coded):
        return x.scale * (x.codes.astype(jnp.float32) - x.cx)
    if isinstance(x, CodedFP):
        from ..numerics.codec import unpack_consts, unpack_exmy_bits

        eb, ss = unpack_consts(x.bias, x.mant_width)
        return unpack_exmy_bits(x.codes, x.expo_width, x.mant_width, eb, ss,
                                dtype=dtype)
    if isinstance(x, Affine):
        v = x.x.astype(jnp.float32) * x.scale + x.bias
        if x.lo is not None:
            v = jnp.maximum(v, x.lo)
        if x.hi is not None:
            v = jnp.minimum(v, x.hi)
        return v
    return x


def coded_shape(x):
    """Shape of a maybe-Coded/Affine value without decoding it."""
    return x.shape if isinstance(x, Affine) else (
        x.codes.shape if isinstance(x, (Coded, CodedFP)) else x.shape)


def codes_eligible(qcfg: "QuantizerConfig", qp: "QuantPhase") -> bool:
    """Whether a site may emit :class:`Coded`/:class:`CodedFP` under this
    phase: chained serving with a frozen per-tensor grid (``as_codes``
    guards). FP sites additionally need a static byte-sized format
    (``mse_include_mantissa_bits``/``learn_mantissa_bits`` could elect a
    different mantissa width than the static config — the codes would decode
    with the wrong field split)."""
    if not (qp.chained and not qp.estimating and not qcfg.per_channel):
        return False
    if qcfg.method != QMethod.fp_quantizer:
        return True
    f = qcfg.fp8
    mant = int(f.mantissa_bits)
    expo = qcfg.n_bits - 1 - mant
    return (not f.allow_unsigned and not f.learn_mantissa_bits
            and not f.mse_include_mantissa_bits
            and expo >= 1 and 1 + expo + mant <= 8)


@dataclasses.dataclass(frozen=True)
class QuantPhase:
    """Static per-call quantization context.

    Replaces the reference's ``_quant_w``/``_quant_a`` buffers
    (base_quantized_classes.py:104-105) and ``Qstates`` with explicit, static
    call context — one trace per phase.
    """

    phase: str = "fixed"  # "estimate" | "fixed"
    quant_w: bool = True
    quant_a: bool = True
    grad_scaling: bool = False
    # BN re-estimation pass: recompute BN running stats from the batch
    # (utils/qat_utils.py:48-108); averaged over batches by the eval driver
    reestimate_bn: bool = False
    # populate the ``quant_cache`` collection with pre-quantized weights so
    # subsequent fixed-phase calls skip the per-forward weight quantization
    # (weights are frozen after calibration; the reference requantizes every
    # forward, hijacker.py:117-128)
    cache_weights: bool = False
    # bf16 fast inference: FP quant sites emit bfloat16 (exact for ExMy
    # values with mant_width <= 7 — every n_bits<=8 format) and the layer
    # matmuls/convs consume bf16 with f32 accumulation, halving activation
    # HBM traffic model-wide. All non-quantized arithmetic upcasts back to
    # f32, so values stay bit-identical to the fixed phase; only dot-product
    # accumulation order can differ.
    fast: bool = False
    # packed-FP8 serving: dense layers read 1-byte ExMy weight codes from the
    # ``quant_cache`` collection (``ops.fastpath.pack_dense_caches``) and run
    # the fused dequantize->matmul Pallas kernel — real 8-bit storage, half
    # the weight HBM traffic of the bf16 fast mode (the reference only ever
    # simulates FP8 in f32 tensors, SURVEY §0). Layers without packed codes
    # fall through to their normal path.
    packed: bool = False
    # chained int8 serving (uniform quantizers, on top of ``packed``):
    # activation sites emit ``Coded`` int8 codes instead of fake-quantized
    # f32 — a layer's requant epilogue IS the next layer's input
    # representation (the steady state of the reference's hijacker protocol,
    # hijacker.py:95-114) — quartering inter-layer activation HBM traffic.
    # Value-identical to the unchained packed path (see ``Coded``). Models
    # must be chained-aware (their elementwise code calls ``decoded``).
    chained: bool = False
    # fused Pallas SDPA (ops/pallas/attention.py) in serving fast modes:
    # None = auto (real-TPU backends, VMEM permitting), False = pin the
    # bit-stable einsum path, True = force (CPU runs it interpreted). An
    # explicit phase knob so serving runs can pin behavior without touching
    # the module-global bench hooks (ADVICE r2 #3).
    fused_sdpa: "bool | None" = None

    @property
    def estimating(self) -> bool:
        return self.phase == "estimate"


FP32 = QuantPhase(quant_w=False, quant_a=False)
ESTIMATE = QuantPhase(phase="estimate")
FIXED = QuantPhase(phase="fixed")
FAST = QuantPhase(phase="fixed", fast=True)
PACKED = QuantPhase(phase="fixed", fast=True, packed=True)
CHAINED = QuantPhase(phase="fixed", fast=True, packed=True, chained=True)


def fold_quantize_affine(aff: "Affine", s, zp, lo_i, hi_i):
    """Integer grid codes ``x_int`` of quantizing a pending-:class:`Affine`
    value on a frozen per-tensor uniform grid, with the affine and clamp
    folded in: one mul, one add, one round, one clip per element.

    Mirrors ``clip(round(clip(x*scale+bias, lo, hi)/s) + zp, lo_i, hi_i)``.
    The value clamp merges into the integer bounds by monotonicity of round
    (``round(clip(v,l,h)/s) == clip(round(v/s), round(l/s), round(h/s))``).
    ``zp`` stays OUTSIDE the round: ``jnp.round`` is half-to-even, and
    banker's rounding does not commute with integer shifts
    (``round(2.5)=2`` but ``round(2.5+13)=16``) — folding ``zp`` into the
    round argument would flip exact-tie codes whenever ``zp`` is odd."""
    k = aff.scale / s
    c = aff.bias / s
    t = jnp.round(aff.x * k + c) + zp
    lo_b, hi_b = lo_i + 0.0, hi_i + 0.0
    if aff.lo is not None:
        lo_b = jnp.maximum(lo_b, jnp.round(aff.lo / s) + zp)
    if aff.hi is not None:
        hi_b = jnp.minimum(hi_b, jnp.round(aff.hi / s) + zp)
    return jnp.clip(t, lo_b, hi_b)


class QuantSite(nn.Module):
    """Quantizer + range estimator for one tensor site."""

    qcfg: QuantizerConfig
    ecfg: EstimatorConfig
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED, *, with_bias: bool = False,
                 as_codes: bool = False, as_affine: bool = False):
        """Quantize ``x``; optionally also return the FP exponent bias.

        Returns ``y`` or ``(y, bias)`` when ``with_bias`` (the approx-matmul
        path needs the derived ``custom_bias``, hijacker.py:130-137).

        ``as_codes`` (chained serving): return a :class:`Coded` — the int8
        codes of this site's frozen uniform grid instead of the
        fake-quantized f32 values. ``decoded`` of the result is bit-exact
        with the normal return. Per-tensor uniform quantizers, fixed phase
        only.

        ``as_affine`` (fused CNN boundary serving): return an :class:`Affine`
        carrying the integer grid codes with the dequant multiply pending
        (``value = x_int*s - zp*s``) — downstream affine stages (BN) fold
        into it instead of materializing. Per-tensor uniform, fixed phase.
        """
        pending_aff = None
        if isinstance(x, Affine):
            # fused-boundary input: fold the pending affine+clamp into this
            # site's quantization when the grid is frozen per-tensor uniform
            if qp.estimating or self.qcfg.per_channel:
                x = decoded(x)
            elif self.qcfg.method == QMethod.fp_quantizer:
                # FP8 fused boundary (VERDICT r4 next #6): keep the affine
                # pending — it folds into the FP8 quantize's clip below
                # (``fp_apply_affine``), so the producer's BN + clamp cost
                # 2 elementwise ops here instead of the decode's 4 plus the
                # separate quantizer clip
                pending_aff = x
                x = x.x
            else:
                s, zp, lo_i, hi_i = self.uniform_int_params()
                x_int = fold_quantize_affine(x, s[0], zp[0], lo_i[0], hi_i[0])
                if as_codes:
                    shift = jnp.where(lo_i[0] < 0.0, 0.0, 128.0)
                    return Coded((x_int - shift).astype(jnp.int8), s[0],
                                 zp[0] - shift)
                if as_affine:
                    return Affine(x_int, s[0], -zp[0] * s[0])
                y = (x_int - zp[0]) * s[0]
                return (y, None) if with_bias else y
        if as_affine:
            if (qp.estimating or self.qcfg.per_channel
                    or self.qcfg.method == QMethod.fp_quantizer):
                raise ValueError(
                    "as_affine needs a frozen per-tensor uniform site")
            s, zp, lo_i, hi_i = self.uniform_int_params()
            if x.dtype != jnp.float32:
                x = x.astype(jnp.float32)
            x_int = jnp.clip(jnp.round(x / s[0]) + zp[0], lo_i[0], hi_i[0])
            return Affine(x_int, s[0], -zp[0] * s[0])
        if isinstance(x, (Coded, CodedFP)):
            x = decoded(x)  # fused dequant: reads 1 B/element
        fp_codes = as_codes and self.qcfg.method == QMethod.fp_quantizer
        if as_codes and not fp_codes:
            if qp.estimating or self.qcfg.per_channel:
                raise ValueError(
                    "as_codes needs a frozen per-tensor site")
            from ..ops.fastpath import quantize_acts_int8

            if x.dtype != jnp.float32:
                x = x.astype(jnp.float32)
            s, zp, lo, hi = self.uniform_int_params()
            codes, cx = quantize_acts_int8(x, s[0], zp[0], lo[0], hi[0])
            return Coded(codes, s[0], cx)
        if fp_codes and not codes_eligible(self.qcfg, qp):
            raise ValueError(
                "as_codes on an FP site needs a frozen per-tensor "
                "byte-sized static format (see codes_eligible)")
        # quantizer math always runs in f32; a bf16 input from an upstream
        # fast-mode site holds grid-exact values, so the upcast is lossless
        if x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        per_channel = self.qcfg.per_channel
        c = x.shape[self.channel_axis] if per_channel else 1

        qstate = self.variable("quant", "q", lambda: quantizers.init(self.qcfg, c))
        estate = self.variable(
            "quant_est",
            "est",
            lambda: estimators.init(self.ecfg, self.qcfg, x.shape, per_channel,
                                    self.channel_axis),
        )

        q = qstate.value
        if qp.estimating:
            new_est, (x_min, x_max, mbits) = estimators.update(
                self.ecfg, self.qcfg, estate.value, x, per_channel, self.channel_axis
            )
            q = quantizers.set_quant_range(self.qcfg, q, x_min, x_max)
            if mbits is not None and self.qcfg.method == QMethod.fp_quantizer:
                # FP_MSE elects mantissa bits (range_estimators.py:364-366)
                q = dict(q, mantissa_bits=mbits.astype(jnp.float32))
            if self.is_mutable_collection("quant"):
                qstate.value = q
            if self.is_mutable_collection("quant_est"):
                estate.value = new_est

        if self.qcfg.method == QMethod.fp_quantizer:
            if pending_aff is not None:
                y, bias = quantizers.fp_apply_affine(
                    self.qcfg, q, pending_aff.replace(x=x), self.channel_axis)
            else:
                y, bias = quantizers.fp_apply(self.qcfg, q, x,
                                              self.channel_axis)
            if fp_codes:
                # chained FP8 serving: emit the STE-grid values as 1-byte
                # ExMy codes on the safe packing bias — the layer's output
                # write IS the next layer's 1 B/element input
                from ..numerics.codec import pack_exmy

                mant = int(self.qcfg.fp8.mantissa_bits)
                expo = self.qcfg.n_bits - 1 - mant
                pb = self.fp_pack_bias()[0]
                codes = pack_exmy(y.astype(jnp.float32), expo, mant, pb,
                                  clip_of=True)
                return CodedFP(codes=codes, bias=pb, expo_width=expo,
                               mant_width=mant)
            if qp.fast and not qp.estimating and self.qcfg.n_bits <= 8:
                # every ExMy value with mant_width <= 7 is exact in bf16
                y = y.astype(jnp.bfloat16)
        else:
            y = quantizers.uniform_apply(
                self.qcfg, q, x, self.channel_axis, qp.grad_scaling
            )
            bias = None
        if with_bias:
            return y, bias
        return y

    def fp_bias(self, qp: QuantPhase = FIXED):
        """Derived exponent bias from the current state (manager.get_fp_bias)."""
        qstate = self.get_variable("quant", "q")
        if qstate is None or self.qcfg.method != QMethod.fp_quantizer:
            return None
        return quantizers.fp_bias(self.qcfg, qstate)

    def fp_pack_bias(self):
        """Safe int32 bias for 1-byte code packing (``numerics.codec``).

        The STE quantizer *rounds* its bias, which can place the top binade
        at exponent ``2^E`` — one past the packed field. Returns ``bias``
        when ``maxval``'s binade fits the field, else ``bias - 1`` (the
        true-8-bit grid whose ``max_norm`` covers ``maxval``); the binade
        test is exact integer arithmetic on the IEEE exponent field.
        """
        qstate = self.get_variable("quant", "q")
        bias = quantizers.fp_bias(self.qcfg, qstate).astype(jnp.int32)
        mant = int(self.qcfg.fp8.mantissa_bits)
        expo = self.qcfg.n_bits - 1 - mant
        mv = qstate["maxval"].astype(jnp.float32)
        e_ieee = (jnp.right_shift(
            lax.bitcast_convert_type(mv, jnp.int32), 23) & 0xFF) - 127
        fits = (e_ieee + bias) <= (1 << expo) - 1
        return jnp.where(fits, bias, bias - 1)

    def uniform_int_params(self):
        """Scalars for the int8 MXU fast path (``fastpath.quantize_acts_int8``):
        (scale, zero_point, int_min, int_max) from the frozen uniform state."""
        q = self.get_variable("quant", "q")
        scale = quantizers._uniform_scale(self.qcfg, q["delta"])
        if self.qcfg.method == QMethod.symmetric_uniform:
            int_min, int_max = quantizers._sym_int_bounds(self.qcfg,
                                                          q["signed"])
            zp = jnp.zeros_like(scale)
        else:
            int_min = jnp.zeros((1,), jnp.float32)
            int_max = jnp.full((1,), 2.0 ** self.qcfg.n_bits - 1, jnp.float32)
            zp = jnp.clip(jnp.round(q["zero_float"]), int_min, int_max)
        return scale, zp, int_min, int_max
