"""Quantized layers with the reference's forward protocol, as flax modules.

TPU-native replacement for the ``QuantizationHijacker`` mixin zoo
(`/root/reference/quantization/hijacker.py:32-151`,
`quantization/quantized_folded_bn.py`, `quantization/autoquant_utils.py`,
`approx/approx_calculation.py`): instead of hijacking ``nn.Module.forward`` at
runtime, each layer *is defined* with three QuantSites (activation / result /
weight) and executes the protocol explicitly:

  input-quant -> weight-quant -> matmul/conv -> res-quant ->
  [approx | quantize-after-mult-and-add rerun] -> fused activation ->
  output-quant

The reference's ``fix_ranges_flag`` double-run (hijacker.py:88-102) maps onto
the phase context: during ``estimate`` the plain product always runs (it
drives the res-quantizer's range estimation); in ``fixed`` phase it runs only
under ``original_quantize_res``. One deviation: if no approx/qama path is
armed and ``original_quantize_res`` is off, the plain product is still
returned in fixed phase (the reference would hit an unbound local there).

The approx matmul here calls the golden jnp oracle with *vectorized*
per-output-channel weight biases (the reference loops output channels,
approx_calculation.py:613-638); the fused Pallas kernel slots in behind the
same interface.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..config import ApproxConfig, EstimatorConfig, QMethod, QuantConfig
from ..numerics.approx_matmul import approx_matmul_golden
from ..numerics.luts import get_error_table
from ..quant.sites import (
    FIXED,
    Coded,
    CodedFP,
    QuantPhase,
    QuantSite,
    coded_shape,
    codes_eligible,
    decoded,
)

Activation = Optional[Callable[[jnp.ndarray], jnp.ndarray]]


def default_fp_bias(approx: ApproxConfig):
    """Fallback when a site has no FP bias (approx_calculation.py:605-606)."""
    return jnp.asarray([float(2 ** (approx.expo_width - 1))], jnp.float32)


def approx_matmul_2d(x2d, w2d, bias_a, bias_b, bias_r, approx: ApproxConfig,
                     allow_pallas: bool = True):
    """(M, K) @ (K, N) through the approximate-multiplier simulation.

    ``bias_b`` is the per-output-channel weight bias vector — one vectorized
    call replaces the reference's per-channel python loop
    (approx_calculation.py:613-638).

    Dispatches to the fused Pallas kernel (no (M,K,N) materialization,
    ~400x faster on TPU) whenever the flag combination supports it; the
    OF/UF adder simulation and debug modes fall back to the jnp oracle.
    """
    pallas_ok = (
        allow_pallas
        and not approx.sim_hw_add_ofuf
        and not approx.debug_mode
        and not approx.self_check_mode
    )
    if pallas_ok:
        from .pallas.approx_matmul import approx_matmul_pallas

        return approx_matmul_pallas(
            jnp.asarray(x2d, jnp.float32),
            jnp.asarray(w2d, jnp.float32),
            jnp.asarray(bias_a, jnp.int32).reshape(()),
            jnp.asarray(bias_b, jnp.int32).reshape(-1),
            jnp.asarray(bias_r, jnp.int32).reshape(()),
            expo_width=approx.expo_width,
            mant_width=approx.mant_width,
            with_comp=approx.with_comp,
            dnsmp_factor=approx.dnsmp_factor,
            with_approx=approx.with_approx,
            with_s2nn2s_opt=approx.with_s2nn2s_opt,
            quant_btw_mult_accu=approx.quant_btw_mult_accu,
            golden_clip_of=approx.golden_clip_of,
        )
    table = get_error_table(
        approx.expo_width, approx.mant_width, approx.with_comp, approx.dnsmp_factor
    )
    return approx_matmul_golden(
        x2d,
        w2d,
        approx.expo_width,
        approx.mant_width,
        jnp.asarray(bias_a, jnp.int32).reshape(()),
        jnp.asarray(bias_b, jnp.int32).reshape(-1),
        jnp.asarray(bias_r, jnp.int32).reshape(()),
        table,
        with_approx=approx.with_approx,
        with_s2nn2s_opt=approx.with_s2nn2s_opt,
        sim_hw_add_ofuf=approx.sim_hw_add_ofuf,
        with_of_opt=approx.with_of_opt,
        with_uf_opt=approx.with_uf_opt,
        golden_clip_of=approx.golden_clip_of,
        quant_btw_mult_accu=approx.quant_btw_mult_accu,
    )


def qama_matmul_2d(x2d, w2d, res_quant: Callable):
    """quantize-after-mult-and-add (approx_calculation.py:627-634): quantize
    every partial product with the res-quantizer's FP8 params, sum over K,
    quantize again."""
    prod3d = x2d[:, :, None] * w2d[None, :, :]
    res2d = res_quant(prod3d).sum(axis=1)
    return res_quant(res2d)


class _Sites:
    """The three QuantSites of one hijacked layer (hijacker.py:50-75)."""

    def __init__(self, module: "_QuantOpBase"):
        qc = module.qc
        act_range = module.act_range_override or qc.act_range
        self.act = QuantSite(
            qc.act_quantizer(module.n_bits_act), act_range,
            name="activation_quantizer",
        )
        self.res = QuantSite(
            qc.act_quantizer(module.n_bits_act), qc.act_range,
            name="res_quantizer",
        )
        self.weight = QuantSite(
            qc.weight_quantizer(module.n_bits_w), qc.weight_range,
            channel_axis=-1, name="weight_quantizer",
        )


class _QuantOpBase(nn.Module):
    """Shared protocol pieces. Subclasses provide the linear op."""

    # class attr (not a dataclass field): True on BN-fused layers, whose
    # result feeds the unfolded BN immediately — emitting chained codes
    # there would decode right back (and BN outputs leave as f32 anyway)
    bn_follows = False

    qc: QuantConfig = QuantConfig()
    activation: Activation = None
    n_bits_w: Optional[int] = None
    n_bits_act: Optional[int] = None
    # False disables the output activation quantizer for this layer — the
    # reference's ``FP32Acts`` substitution (base_quantized_classes.py:209-214,
    # used by quant_setup variants) and the hoisted-site pattern for tied
    # pooling quantizers
    quantize_output: bool = True
    # per-layer activation estimator override — the
    # ``pass_data_for_range_estimation(cross_entropy_layer=...)`` analog
    # (quantization/utils.py:82-93): e.g. give the logits layer a
    # ``RangeMethod.cross_entropy`` estimator while the rest use the default
    act_range_override: Optional["EstimatorConfig"] = None

    def _quant_in(self, sites: _Sites, x, qp: QuantPhase):
        a_bias = None
        if self.qc.quantize_input and qp.quant_a:
            x, a_bias = sites.act(x, qp, with_bias=True)
        return x, a_bias

    def _defer_affine(self, x, qp: QuantPhase):
        """Keep a pending :class:`Affine` input un-materialized when this
        layer's input act site will fold it (the uniform integer fold or the
        FP8 clip fold, VERDICT r4 next #6); decode otherwise. Coded/CodedFP
        inputs always materialize here (XLA fuses the byte decode into the
        consuming op)."""
        from ..quant.sites import Affine

        if isinstance(x, Affine) and self.qc.quantize_input and qp.quant_a:
            return x
        return decoded(x)

    def _quant_weight(self, sites: _Sites, kernel, qp: QuantPhase):
        if not qp.quant_w:
            return kernel, None
        # frozen-weight cache: after calibration, weights are static, so the
        # quantized kernel (and its FP bias) can be materialized once into
        # the ``quant_cache`` collection and reused every forward
        # bf16 weight storage is lossless only for FP (ExMy) grids; uniform
        # grids are not bf16-exact, so fast mode keeps them f32
        fast_bf16 = qp.fast and self.qc.method == QMethod.fp_quantizer
        if qp.cache_weights:
            w, w_bias = sites.weight(kernel, qp, with_bias=True)
            if fast_bf16:
                w = w.astype(jnp.bfloat16)  # grid values: lossless
            wb = w_bias if w_bias is not None else jnp.zeros((0,), jnp.float32)
            # record this layer's weight n_bits so pack_dense_caches packs
            # with the LAYER's format — quant_setup variants override
            # n_bits_w per layer (e.g. fc4), and packing with the global
            # format would silently decode with the wrong field widths
            fmt = jnp.asarray(
                [self.qc.weight_quantizer(self.n_bits_w).n_bits], jnp.int32)
            cw = self.variable("quant_cache", "w_q", lambda: w)
            cb = self.variable("quant_cache", "w_bias", lambda: wb)
            cf = self.variable("quant_cache", "w_nbits", lambda: fmt)
            if self.is_mutable_collection("quant_cache"):
                cw.value, cb.value, cf.value = w, wb, fmt
            return w, w_bias
        if not qp.estimating and self.has_variable("quant_cache", "w_q"):
            w = self.get_variable("quant_cache", "w_q")
            wb = self.get_variable("quant_cache", "w_bias")
            if fast_bf16:
                w = w.astype(jnp.bfloat16)
            elif qp.fast and w.dtype == jnp.bfloat16:
                w = w.astype(jnp.float32)
            return w, (wb if wb.size else None)
        return sites.weight(kernel, qp, with_bias=True)

    def _packed_weights(self, qp: QuantPhase):
        """Packed-FP8 serving path (``qp.packed``): return the 1-byte weight
        codes installed by ``ops.fastpath.pack_dense_caches``, or None when
        this layer has none (falls through to the normal path)."""
        if not (qp.packed and qp.quant_w and not qp.estimating
                and not self._special_armed()
                and self.has_variable("quant_cache", "w_codes")):
            return None
        from .pallas.dequant_matmul import PackedWeights

        wq_cfg = self.qc.weight_quantizer(self.n_bits_w)
        mant = int(wq_cfg.fp8.mantissa_bits)
        return PackedWeights(
            codes=self.get_variable("quant_cache", "w_codes"),
            bias=self.get_variable("quant_cache", "w_pack_bias"),
            exact_fraction=jnp.float32(1.0),
            expo_width=wq_cfg.n_bits - 1 - mant,
            mant_width=mant,
        )

    def _int8_weights(self, qp: QuantPhase, k: int):
        """Native-int8 MXU serving path (``qp.packed`` with uniform
        quantizers): frozen int8 weight codes from ``pack_dense_caches``, or
        None (falls through). Requires per-tensor quantized inputs — the
        activation codes feed the same int8 dot."""
        if not (qp.packed and qp.quant_w and qp.quant_a and not qp.estimating
                and self.qc.quantize_input
                and not self._special_armed()):
            return None, None
        from .fastpath import Int8Weights, unpack_int4

        if self.has_variable("quant_cache", "w_i4"):
            # nibble-packed 4-bit weights (0.5 B/weight at rest). On TPU the
            # fused Pallas kernel unpacks tiles in VMEM (the packed bytes
            # never expand in HBM); elsewhere unpack via jnp bit-ops
            w4 = self.get_variable("quant_cache", "w_i4")
            use_kernel = jax.default_backend() in ("tpu", "axon")
            return Int8Weights(
                codes=None if use_kernel else unpack_int4(w4, k),
                scale=self.get_variable("quant_cache", "w_i4_scale"),
                # zp installed only when some channel has a nonzero c_w
                # (key presence is static -> the Xsum correction elides)
                zp=(self.get_variable("quant_cache", "w_i4_zp")
                    if self.has_variable("quant_cache", "w_i4_zp") else None),
                wsum=self.get_variable("quant_cache", "w_i4_sum"),
            ), (w4 if use_kernel else None)
        if not self.has_variable("quant_cache", "w_i8"):
            return None, None
        return Int8Weights(
            codes=self.get_variable("quant_cache", "w_i8"),
            scale=self.get_variable("quant_cache", "w_i8_scale"),
            zp=(self.get_variable("quant_cache", "w_i8_zp")
                if self.has_variable("quant_cache", "w_i8_zp") else None),
            wsum=self.get_variable("quant_cache", "w_i8_sum"),
        ), None

    def _special_armed(self) -> bool:
        rm = self.qc.run_method
        return rm.res_quantizer_flag and (
            rm.approx_flag or rm.quantize_after_mult_and_add
        )

    def _plain_first(self, qp: QuantPhase) -> bool:
        rm = self.qc.run_method
        return qp.estimating or rm.original_quantize_res or not self._special_armed()

    def _special_matmul(self, sites: _Sites, x2d, w2d, a_bias, w_bias):
        """Dispatch the armed special path on a 2-D matmul."""
        rm = self.qc.run_method
        if rm.quantize_after_mult_and_add:
            return qama_matmul_2d(x2d, w2d, lambda t: sites.res(t, FIXED))
        approx = self.qc.approx
        a_b = a_bias if a_bias is not None else default_fp_bias(approx)
        r_bias = sites.res.fp_bias()
        r_b = r_bias if r_bias is not None else default_fp_bias(approx)
        if w_bias is None:
            raise ValueError("approx path requires quantized weights")
        return approx_matmul_2d(x2d, w2d, a_b[0], w_bias, r_b[0], approx)

    def _tail(self, sites: _Sites, res, qp: QuantPhase):
        if self.activation is not None:
            from ..quant.sites import Affine
            from .activations import CLAMP_ACTIVATIONS

            clamp = CLAMP_ACTIVATIONS.get(self.activation)
            if (isinstance(res, Affine) and clamp is not None
                    and res.lo is None and res.hi is None):
                # fused boundary: a pure-clamp activation sets the Affine's
                # post-affine bounds — it merges EXACTLY into the consumer
                # act site's integer clip (see Affine docstring)
                res = res.with_clamp(*clamp)
            else:
                # fast mode: a bf16 res-site output holds grid-exact values;
                # the activation itself must run in f32 to match fixed phase
                res = decoded(res)  # chained codes dequantize inline
                if res.dtype != jnp.float32:
                    res = res.astype(jnp.float32)
                res = self.activation(res)
        if not self.qc.quantize_input and qp.quant_a and self.quantize_output:
            res = sites.act(res, qp)
        return res


class QuantDense(_QuantOpBase):
    """Quantized fully-connected layer (~ ``QuantLinear``,
    autoquant_utils.py:166-174)."""

    features: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        sites = _Sites(self)
        res = self._dense_body(sites, x, qp)
        return self._tail(sites, res, qp)

    def _dense_body(self, sites: _Sites, x, qp: QuantPhase):
        lead_shape = coded_shape(x)[:-1]
        k_in = coded_shape(x)[-1]
        iw, w4 = self._int8_weights(qp, k_in)
        if iw is not None:
            # native int8 MXU: activation codes x weight codes accumulate
            # exactly in int32 at 2x the bf16 matmul throughput (v5e)
            from .fastpath import quantize_acts_int8, quantized_matmul_int8

            s, zp, lo, hi = sites.act.uniform_int_params()
            # chained input: dequantize the upstream site's codes inline
            # (1 B/element read) — bit-exact with the fake-quantized f32
            x2d = decoded(x).reshape(-1, k_in).astype(jnp.float32)
            codes, cx = quantize_acts_int8(x2d, s[0], zp[0], lo[0], hi[0])
            acc = None
            if w4 is not None:
                # tensor-parallel under parallel.partitioned_kernels(mesh):
                # the nibble codes stay N-sharded per chip (no all-gather)
                from ..parallel.shard_kernels import sharded_int4_matmul

                acc = sharded_int4_matmul(codes, w4, k=k_in)
            # iw.zp is present only for layers where some channel calibrated
            # UNSIGNED (all-nonnegative kernel -> signed=0, effective -128
            # zero point); signed-symmetric layers statically skip the whole
            # Xsum correction (an extra (M, K) reduction)
            out2d = quantized_matmul_int8(codes, iw, s[0], cx,
                                          w_has_zp=iw.zp is not None, acc=acc)
            res = out2d.reshape(*lead_shape, self.features)
            if self.use_bias:
                res = res + self.param(
                    "bias", nn.initializers.zeros_init(), (self.features,)
                )
            if qp.quant_a and self.qc.run_method.res_quantizer_flag:
                # chained: the res-quant epilogue emits int8 codes straight
                # out of the matmul epilogue — the layer's OUTPUT writes
                # 1 B/element (consumers call ``decoded``)
                res = sites.res(
                    res, qp,
                    as_codes=codes_eligible(
                        self.qc.act_quantizer(self.n_bits_act), qp)
                    and not self.bn_follows)
            return res

        pw = self._packed_weights(qp)
        if pw is not None:
            # real-8-bit serving: weights stay 1 byte in HBM, decoded to bf16
            # in VMEM inside the fused kernel. The f32 ``kernel`` param is
            # never requested, so ``strip_packed_params`` can drop it.
            # Tensor-parallel under parallel.partitioned_kernels(mesh): each
            # chip decodes only its (K, N/model) code shard via shard_map.
            from ..parallel.shard_kernels import (
                sharded_dequant_matmul as dequant_matmul)

            acfg = self.qc.act_quantizer(self.n_bits_act)
            chain_in = (self.qc.quantize_input and qp.quant_a
                        and codes_eligible(acfg, qp))
            if chain_in:
                # chained FP8: re-quantize the input on this layer's act
                # grid AND emit it as 1-byte codes — the kernel decodes the
                # uint8 tile in VMEM, so the x boundary read stays
                # 1 B/element (an f32/bf16 x would have to materialize in
                # HBM before the pallas_call; XLA cannot fuse into it).
                # Coded/CodedFP/Affine inputs fold inside the site.
                xa = sites.act(x, qp, as_codes=True)
                x2d = xa.codes.reshape(-1, k_in)
                xkw = dict(x_bias=xa.bias, x_expo=xa.expo_width,
                           x_mant=xa.mant_width)
            else:
                x = self._defer_affine(x, qp)
                x, _ = self._quant_in(sites, x, qp)
                x2d = x.reshape(-1, k_in).astype(jnp.bfloat16)
                xkw = {}
            out2d = dequant_matmul(
                x2d, pw.codes, pw.bias,
                expo_width=pw.expo_width, mant_width=pw.mant_width, **xkw,
            )
            res = out2d.reshape(*lead_shape, self.features)
            if self.use_bias:
                res = res + self.param(
                    "bias", nn.initializers.zeros_init(), (self.features,)
                )
            if (self.qc.quantize_input and qp.quant_a
                    and self.qc.run_method.res_quantizer_flag):
                res = sites.res(res, qp, as_codes=codes_eligible(acfg, qp)
                                and not self.bn_follows)
            return res
        x = self._defer_affine(x, qp)

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (coded_shape(x)[-1], self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )

        x, a_bias = self._quant_in(sites, x, qp)
        w, w_bias = self._quant_weight(sites, kernel, qp)

        res = None
        if self._plain_first(qp):
            # f32 operands: XLA's default f32 dot already rides the
            # single-pass bf16 MXU (explicit casts benchmarked slower).
            # fast mode: both operands arrive bf16 (grid-exact) and the dot
            # reads half the bytes; accumulation stays f32
            res = jnp.matmul(x, w, preferred_element_type=jnp.float32)
            if bias is not None:
                res = res + bias
            if self.qc.quantize_input and qp.quant_a and self.qc.run_method.res_quantizer_flag:
                res = sites.res(
                    res, qp,
                    as_codes=codes_eligible(
                        self.qc.act_quantizer(self.n_bits_act), qp)
                    and not self.bn_follows)

        if self._special_armed():
            # special paths simulate in f32 (grid values: lossless upcast)
            x2d = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            w = w.astype(jnp.float32)
            out2d = self._special_matmul(sites, x2d, w, a_bias, w_bias)
            res = out2d.reshape(*x.shape[:-1], self.features)
            if bias is not None:
                res = res + bias

        return res


def _conv_dimension_numbers(n_spatial: int):
    """NHWC-style dimension-number strings for 1-D/2-D/3-D convs."""
    letters = "DHW"[3 - n_spatial:]
    return ("N" + letters + "C", letters + "IO", "N" + letters + "C")


def conv_patches(x, kernel_shape, strides, padding, dilation,
                 input_dilation=None):
    """im2col via XLA (replaces the python-loop im2col,
    approx_calculation.py:552-575). Any spatial rank. Returns
    (B, *out_spatial, prod(K)*I) patches whose last-dim ordering matches a
    (*K, I, O) kernel reshaped to ``(prod(K)*I, O)``. ``input_dilation``
    dilates the input (the transposed-conv formulation)."""
    spatial = tuple(kernel_shape[:-2])
    in_ch = x.shape[-1]
    patches = lax.conv_general_dilated_patches(
        x,
        filter_shape=spatial,
        window_strides=strides,
        padding=padding,
        lhs_dilation=input_dilation,
        rhs_dilation=dilation,
        dimension_numbers=_conv_dimension_numbers(len(spatial)),
    )
    # patches features are ordered (I, *K); reorder to (*K, I)
    lead = patches.shape[:-1]
    k_elems = math.prod(spatial)
    patches = patches.reshape(*lead, in_ch, k_elems)
    patches = jnp.moveaxis(patches, -2, -1).reshape(*lead, k_elems * in_ch)
    return patches


class QuantConv(_QuantOpBase):
    """Quantized convolution, any spatial rank (~ ``QuantConv1d``/``QuantConv``/
    ``BNQConv`` conv part, autoquant_utils.py:20-122).

    N..C inputs (NWC/NHWC/NDHWC), (*K, I, O) kernels; per-channel weight
    quantization along O. Grouped/depthwise via ``feature_group_count``; the
    special paths run the groups as one batched (vmapped) matmul instead of
    the reference's python loop (approx_calculation.py:691-708).
    """

    features: int = 0
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Optional[Tuple[int, ...]] = None
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    kernel_dilation: Optional[Tuple[int, ...]] = None
    feature_group_count: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        sites = _Sites(self)
        res = self._conv_body(sites, x, qp)
        return self._tail(sites, res, qp)

    def _spatial_defaults(self):
        n = len(self.kernel_size)
        ones = (1,) * n
        return (tuple(self.strides) if self.strides is not None else ones,
                tuple(self.kernel_dilation) if self.kernel_dilation is not None
                else ones)

    def _conv_plan(self, x):
        """(window_strides, padding, input_dilation) for the underlying
        correlation. Overridden by ``QuantConvTranspose``."""
        strides, _ = self._spatial_defaults()
        return strides, self.padding, None

    def _conv_int8(self, sites: _Sites, x, qp: QuantPhase):
        """Native int8 conv serving (VERDICT r2 next #3): activation codes x
        frozen int8 kernel codes accumulate exactly in int32 on the 2x-rate
        int8 MXU (``fastpath.quantized_conv_int8``). Needs a per-tensor
        uniform act site with quantized inputs; padding/dilation fill with
        the cx code so unsigned/asymmetric sites (every ReLU-fed site) stay
        exact. Returns the pre-BN result or None.

        Under ``qp.chained`` the boundary FUSES (VERDICT r3 next #1): an
        incoming pending :class:`Affine` (the previous conv's epilogue + BN
        + clamp) folds into this act site's quantization as one
        mul-add-round-clip, and the result goes out as a new ``Affine`` so
        BN (:func:`_unfolded_bn`), the clamp activation (``_tail``) and the
        NEXT act site fold in turn — the ~15-op/element inter-conv chain of
        the unchained path collapses to ~6 ops/element."""
        from ..config import QMethod
        from ..quant.sites import Affine

        if not (qp.packed and qp.quant_w and qp.quant_a and not qp.estimating
                and self.qc.quantize_input and not self._special_armed()):
            return None
        acfg = self.qc.act_quantizer(self.n_bits_act)
        if acfg.method == QMethod.fp_quantizer or acfg.per_channel:
            return None
        has8 = self.has_variable("quant_cache", "w_i8")
        has4 = self.has_variable("quant_cache", "w_i4")
        if not (has8 or has4):
            return None
        from .fastpath import (
            quantize_acts_affine, quantize_acts_int8, quantized_conv_int8,
            unpack_int4)

        in_ch = coded_shape(x)[-1]
        ksize = tuple(self.kernel_size)
        g = self.feature_group_count
        kernel_shape = (*ksize, in_ch // g, self.features)
        _, dilation = self._spatial_defaults()
        window_strides, padding, input_dilation = self._conv_plan(x)

        s, zp, lo, hi = sites.act.uniform_int_params()
        if isinstance(x, Affine):
            codes, cx = quantize_acts_affine(x, s[0], zp[0], lo[0], hi[0])
        else:
            x = decoded(x)
            codes, cx = quantize_acts_int8(
                x.reshape(-1, in_ch).astype(jnp.float32), s[0], zp[0], lo[0],
                hi[0])
            codes = codes.reshape(x.shape)
        if has4:
            k_flat = math.prod(kernel_shape[:-1])
            w_codes = unpack_int4(
                self.get_variable("quant_cache", "w_i4"), k_flat
            ).reshape(kernel_shape)
            scale = self.get_variable("quant_cache", "w_i4_scale")
            zp_w = (self.get_variable("quant_cache", "w_i4_zp")
                    if self.has_variable("quant_cache", "w_i4_zp") else None)
            wsum = self.get_variable("quant_cache", "w_i4_sum")
        else:
            w_codes = self.get_variable("quant_cache", "w_i8")
            scale = self.get_variable("quant_cache", "w_i8_scale")
            zp_w = (self.get_variable("quant_cache", "w_i8_zp")
                    if self.has_variable("quant_cache", "w_i8_zp") else None)
            wsum = self.get_variable("quant_cache", "w_i8_sum")
        fuse = qp.chained  # fused-boundary serving currency
        res = quantized_conv_int8(
            codes, w_codes, s[0], scale, cx, wsum,
            window_strides=window_strides, padding=padding,
            lhs_dilation=input_dilation, rhs_dilation=dilation,
            dimension_numbers=_conv_dimension_numbers(len(ksize)),
            feature_group_count=g, zp=zp_w, as_affine=fuse,
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,))
            res = (res.replace(bias=res.bias + b)  # O(C) vector add
                   if isinstance(res, Affine) else res + b)
        if qp.quant_a and self.qc.run_method.res_quantizer_flag:
            if isinstance(res, Affine):
                # res fake-quant folds onto the pending affine; stays Affine
                # ahead of a folding BN, else emits Coded (1 B/elem) where
                # eligible as in the unfused chained path
                if self.bn_follows:
                    res = sites.res(res, qp, as_affine=True)
                else:
                    res = sites.res(res, qp,
                                    as_codes=codes_eligible(acfg, qp))
            else:
                res = sites.res(
                    res, qp,
                    as_codes=codes_eligible(acfg, qp) and not self.bn_follows)
        return res

    def _conv_body(self, sites: _Sites, x, qp: QuantPhase):
        # x may arrive as Coded (chained) or Affine (fused boundary) — the
        # int8 path folds them into its act quantization without
        # materializing; the simulation paths materialize below
        res_i8 = self._conv_int8(sites, x, qp)
        if res_i8 is not None:
            return res_i8
        # chained codes: inline dequant (1 B/element read); a pending Affine
        # stays pending when the input act site can fold it (FP8 serving)
        x = self._defer_affine(x, qp)
        in_ch = coded_shape(x)[-1]
        ksize = tuple(self.kernel_size)
        _, dilation = self._spatial_defaults()
        window_strides, padding, input_dilation = self._conv_plan(x)
        g = self.feature_group_count
        kernel_shape = (*ksize, in_ch // g, self.features)
        pw = self._packed_weights(qp)
        # real-8-bit conv serving: 1-byte ExMy kernel codes decoded by XLA
        # bit-ops (fused into the conv's weight read — kernels are small vs
        # conv compute); the f32 ``kernel`` param is never requested, so
        # ``strip_packed_params`` can drop it
        kernel = (None if pw is not None else self.param(
            "kernel", nn.initializers.lecun_normal(), kernel_shape))
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )

        x, a_bias = self._quant_in(sites, x, qp)
        if pw is not None:
            from ..numerics.codec import unpack_exmy

            w = unpack_exmy(
                pw.codes, pw.expo_width, pw.mant_width, pw.bias[None, :],
                dtype=jnp.bfloat16 if qp.fast else jnp.float32,
            ).reshape(kernel_shape)
            w_bias = None
        else:
            w, w_bias = self._quant_weight(sites, kernel, qp)

        res = None
        if self._plain_first(qp):
            res = lax.conv_general_dilated(
                x, w,
                window_strides=window_strides,
                padding=padding,
                lhs_dilation=input_dilation,
                rhs_dilation=dilation,
                dimension_numbers=_conv_dimension_numbers(len(ksize)),
                feature_group_count=g,
                preferred_element_type=jnp.float32,
            )
            if bias is not None:
                res = res + bias
            if self.qc.quantize_input and qp.quant_a and self.qc.run_method.res_quantizer_flag:
                res = sites.res(res, qp)

        if self._special_armed():
            # special paths simulate in f32 (grid values: lossless upcast)
            x = x.astype(jnp.float32)
            w = w.astype(jnp.float32)
            patches = conv_patches(
                x, kernel_shape, window_strides, padding, dilation,
                input_dilation=input_dilation,
            )
            lead = patches.shape[:-1]
            m = math.prod(lead)
            k_elems = math.prod(ksize)
            in_per_group = in_ch // g
            kg = k_elems * in_per_group
            og = self.features // g
            # patches last dim ordered (*K, I); I splits into (G, I/g)
            pg = patches.reshape(m, k_elems, g, in_per_group)
            pg = jnp.moveaxis(pg, 2, 0).reshape(g, m, kg)
            wg = w.reshape(k_elems, in_per_group, g, og)
            wg = jnp.moveaxis(wg, 2, 0).reshape(g, kg, og)
            if w_bias is None:
                wb_g = jnp.zeros((g, og))
            elif w_bias.size == 1:
                # per-tensor weight quantization: one bias for all channels
                wb_g = jnp.broadcast_to(w_bias.reshape(1, 1), (g, og))
            else:
                wb_g = w_bias.reshape(g, og)

            rm = self.qc.run_method
            if rm.quantize_after_mult_and_add:
                res_q = lambda t: sites.res(t, FIXED)
                outs = [qama_matmul_2d(pg[i], wg[i], res_q) for i in range(g)]
                out_g = jnp.stack(outs) if g > 1 else outs[0][None]
            else:
                approx = self.qc.approx
                a_b = a_bias if a_bias is not None else default_fp_bias(approx)
                r_bias = sites.res.fp_bias()
                r_b = r_bias if r_bias is not None else default_fp_bias(approx)
                if w_bias is None:
                    raise ValueError("approx path requires quantized weights")

                if g == 1:
                    out_g = approx_matmul_2d(
                        pg[0], wg[0], a_b[0], wb_g[0], r_b[0], approx
                    )[None]
                else:
                    # grouped/depthwise: vmapped oracle (pallas_call does not
                    # vmap; per-group matmuls are tiny anyway)
                    def one_group(p2d, w2d, wb):
                        return approx_matmul_2d(p2d, w2d, a_b[0], wb, r_b[0],
                                                approx, allow_pallas=False)

                    out_g = jax.vmap(one_group)(pg, wg, wb_g)

            out = jnp.moveaxis(out_g, 0, 1).reshape(m, self.features)
            res = out.reshape(*lead, self.features)
            if bias is not None:
                res = res + bias
        return res


class QuantConv1d(QuantConv):
    """Quantized 1-D convolution (~ ``QuantConv1d``, autoquant_utils.py:20-30).
    NWC inputs, (KW, I, O) kernels; everything else as ``QuantConv``."""

    kernel_size: Tuple[int, ...] = (3,)


def conv_transpose_padding(k: int, s: int, d: int, padding: str):
    """Per-dim explicit padding that makes an input-dilated correlation equal
    ``lax.conv_transpose`` with string padding (same formula as XLA's
    ``_conv_transpose_padding``; ``d`` = kernel dilation)."""
    k = d * (k - 1) + 1  # effective kernel size
    if padding == "SAME":
        pad_len = k + s - 2
        pad_a = k - 1 if s > k - 1 else int(math.ceil(pad_len / 2))
    elif padding == "VALID":
        pad_len = k + s - 2 + max(k - s, 0)
        pad_a = k - 1
    else:
        raise ValueError(f"unsupported transpose padding {padding!r}")
    return (pad_a, pad_len - pad_a)


class QuantConvTranspose(_QuantOpBase):
    """Quantized transposed convolution, any spatial rank
    (~ ``QuantConvTranspose(1d)``, autoquant_utils.py:46-87).

    Implemented as the equivalent input-dilated correlation (what
    ``lax.conv_transpose`` lowers to), so the plain path, the approx path and
    the quantize-after-mult-and-add path all reuse ``QuantConv``'s machinery
    with ``input_dilation=strides``. Kernels are (*K, I, O) with the kernel
    applied un-flipped (``transpose_kernel=False`` semantics, matching
    ``flax.linen.ConvTranspose``); torch ``ConvTranspose*d`` weights are
    converted by ``models/porting.py::port_conv_transpose_kernel``.

    Per-channel weight quantization runs along the *output*-channel axis. The
    reference needs a transpose trick for this because torch stores transpose
    weights (in, out, *K) with out-channels on dim 1
    (autoquant_utils.py:46-58); in the (*K, I, O) layout the output axis is
    already the quantizer's channel axis, so no trick is required.

    ``padding`` may be "SAME"/"VALID" (flax/lax convention) or explicit
    (lo, hi) pairs on the *underlying dilated correlation* — torch's
    ``padding``/``output_padding`` map to ``(d*(k-1)-p, d*(k-1)-p+op)``.
    """

    features: int = 0
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Optional[Tuple[int, ...]] = None
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    kernel_dilation: Optional[Tuple[int, ...]] = None
    use_bias: bool = True

    # reuse QuantConv's conv machinery (grouped transpose convs are not in
    # the reference's surgery maps; keep g=1)
    feature_group_count: int = 1
    _spatial_defaults = QuantConv._spatial_defaults
    _conv_body = QuantConv._conv_body
    _conv_int8 = QuantConv._conv_int8

    def _conv_plan(self, x):
        strides, dilation = self._spatial_defaults()
        ones = (1,) * len(self.kernel_size)
        if isinstance(self.padding, str):
            pads = tuple(
                conv_transpose_padding(k, s, d, self.padding)
                for k, s, d in zip(self.kernel_size, strides, dilation)
            )
        else:
            pads = tuple(tuple(p) for p in self.padding)
        return ones, pads, strides

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        sites = _Sites(self)
        res = self._conv_body(sites, x, qp)
        return self._tail(sites, res, qp)


class QuantConvTranspose1d(QuantConvTranspose):
    """1-D transposed convolution (~ ``QuantConvTranspose1d``,
    autoquant_utils.py:61-73)."""

    kernel_size: Tuple[int, ...] = (3,)


class BNQuantConv(QuantConv):
    bn_follows = True
    """Quantized conv + *unfolded* batch norm (~ ``BNQConv`` via
    ``BNFusedHijacker``, quantized_folded_bn.py:18-95).

    BN keeps FP32 running stats and gamma/beta, applied after the quantized
    conv result (and any res-quant / special rerun), before the fused
    activation — the reference's exact ordering (quantized_folded_bn.py:30-82).
    ``reestimate=True`` recomputes running stats from the batch (the BN
    re-estimation pass, utils/qat_utils.py:48-108, averages these over
    batches in the eval driver).
    """

    bn_epsilon: float = 1e-5  # torch BatchNorm2d default, mirrored by BNQConv

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        sites = _Sites(self)
        res = self._conv_body(sites, x, qp)
        res = _unfolded_bn(self, res, qp, self.bn_epsilon)
        return self._tail(sites, res, qp)


def _unfolded_bn(module: _QuantOpBase, res, qp: QuantPhase, epsilon: float):
    """Unfolded FP32 BN over all-but-channel axes (BNFusedHijacker's
    ``F.batch_norm``, quantized_folded_bn.py:66-75); shared by the conv and
    linear BN layers. ``qp.reestimate_bn`` recomputes running stats from the
    batch (momentum=1 train-mode BN, utils/qat_utils.py:48-108)."""
    from ..quant.sites import Affine

    features = module.features
    gamma = module.param("gamma", nn.initializers.ones_init(), (features,))
    beta = module.param("beta", nn.initializers.zeros_init(), (features,))
    running_mean = module.variable(
        "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
    )
    running_var = module.variable(
        "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
    )

    if not qp.reestimate_bn and (isinstance(res, Affine) or qp.chained):
        # fused boundary (qp.chained): inference BN is per-channel affine —
        # fold it onto the pending Affine as O(C) vector math instead of 4
        # tensor ops (value identical up to f32 constant-folding ULPs).
        # When the conv result arrived as a plain tensor (the FP8/simulated
        # chained path — no int8 producer), BN leaves as a NEW pending
        # Affine costing 0 elementwise ops; the clamp activation and the
        # next layer's act site fold it (VERDICT r4 next #6)
        rg = lax.rsqrt(running_var.value + epsilon) * gamma
        rb = beta - running_mean.value * rg
        if isinstance(res, Affine):
            return res.then_affine(rg, rb)
        return Affine(decoded(res), rg, rb)

    res = decoded(res)  # defensive: BN math needs materialized floats
    if res.dtype != jnp.float32:
        res = res.astype(jnp.float32)  # BN math in f32 (fast mode)
    if qp.reestimate_bn:
        # momentum=1 train-mode BN: normalize with (biased) batch stats,
        # store torch-convention unbiased variance in the running buffer
        axes = tuple(range(res.ndim - 1))
        mean = jnp.mean(res, axis=axes)
        var = jnp.var(res, axis=axes)
        n = math.prod(res.shape[:-1])
        if module.is_mutable_collection("batch_stats"):
            running_mean.value = mean
            running_var.value = var * (n / max(n - 1, 1))
    else:
        mean, var = running_mean.value, running_var.value
    return (res - mean) * lax.rsqrt(var + epsilon) * gamma + beta


class BNQuantDense(QuantDense):
    bn_follows = True
    """Quantized linear + unfolded batch norm (~ ``BNQLinear``,
    autoquant_utils.py:118-122 via ``BNFusedHijacker``): FP32 BatchNorm1d
    stats applied after the quantized matmul (and any res-quant / special
    rerun), before the fused activation."""

    bn_epsilon: float = 1e-5  # torch BatchNorm1d default

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        sites = _Sites(self)
        res = self._dense_body(sites, x, qp)
        res = _unfolded_bn(self, res, qp, self.bn_epsilon)
        return self._tail(sites, res, qp)


class QuantLayerNorm(_QuantOpBase):
    """Quantized LayerNorm (~ ``QuantLayerNorm``, autoquant_utils.py:60-91):
    gamma is quantized as the "weight", the output as the activation."""

    epsilon: float = 1e-6
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        sites = _Sites(self)
        x = decoded(x)  # chained input: fused dequant (1 B/element read)
        features = x.shape[-1]

        x, _ = self._quant_in(sites, x, qp)
        if x.dtype != jnp.float32:
            x = x.astype(jnp.float32)  # LN stats in f32 (fast mode)

        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * lax.rsqrt(var + self.epsilon)

        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones_init(), (features,))
            if qp.quant_w:
                scale = sites.weight(scale, qp)
            y = y * scale
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(), (features,))
            y = y + b

        return self._tail(sites, y, qp)


class QuantizedActWrapper(nn.Module):
    """Wrap a parameter-free op (avg-pool etc.) with activation quantization
    (~ ``QuantizedActivationWrapper``, autoquant_utils.py:125-163).

    With ``tie_input_output`` the same site quantizes input and output (the
    reference's ``tie_activation_quantizers``)."""

    qc: QuantConfig = QuantConfig()
    op: Callable[[jnp.ndarray], jnp.ndarray] = lambda x: x
    tie_input_output: bool = False

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        site = QuantSite(
            self.qc.act_quantizer(), self.qc.act_range,
            name="activation_quantizer",
        )
        if self.tie_input_output and qp.quant_a:
            x = site(x, qp)  # folds a pending Affine input (FP8/uniform)
        else:
            x = decoded(x)  # the wrapped op needs materialized values
        y = self.op(x)
        if qp.quant_a:
            y = site(y, qp)
        return y
