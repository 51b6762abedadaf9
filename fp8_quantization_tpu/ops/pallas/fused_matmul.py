"""Fused FP8 quantize -> matmul -> requantize Pallas TPU kernel.

The TPU-native fast path for the quantized-layer hot loop
(input-quant -> matmul -> res-quant, hijacker.py:77-115). Design:

* **Exact bf16 MXU execution.** Every ExMy value with mant_width <= 7 is
  exactly representable in bfloat16, and an FP8xFP8 product has <= 2M+2 <= 16
  mantissa bits — exact in the MXU's float32 accumulation. So the simulated-
  FP8 matmul runs on the native bf16 systolic array with zero simulation
  error, at full MXU throughput.
* **Integer-bit-ops quantization.** The STE quantizer's power-of-two scale
  (fp8_ste.py) is computed per element from the float32 exponent field with
  shifts/bitcasts — no transcendentals (XLA's exp2/log2 are approximate on
  TPU) and no HBM round-trip: the activation tile is quantized in VMEM in the
  matmul prologue; the result tile is requantized in the epilogue.
* Per-tensor activation/result params ride in SMEM; per-channel (N-axis)
  *weight* quantization needs nothing at run time because weights are
  pre-quantized (they are frozen after calibration).

Grid: (M/bm, N/bn, K/bk), K innermost, f32 accumulator scratch in VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_half_even(x):
    return lax.round(x, lax.RoundingMethod.TO_NEAREST_EVEN)


def quantize_block(x, maxval, bias_i, mant_i, sign_i):
    """Elementwise FP8/ExMy fake-quantize via exponent bit manipulation.

    Bit-exact equivalent of ``quantize_to_fp8_ste`` (per-tensor params):
      log_scales = max(ieee_exp(xc) - 126 - 1 + bias, 1)
      scales     = 2^(log_scales - M - bias)
      q          = round(xc * 2^-(...)) * scales

    Works both inside Pallas kernels and as a plain jitted fn.
    """
    minval = jnp.where(sign_i == 1, -maxval, 0.0)
    xc = jnp.clip(x, minval, maxval)
    bits = lax.bitcast_convert_type(xc, jnp.int32)
    # IEEE exponent field; arithmetic shift then mask is sign-safe
    e = jnp.right_shift(bits, 23) & 0xFF
    log_scales = jnp.maximum(e - 127 + bias_i, 1)
    sexp = jnp.clip(log_scales - mant_i - bias_i + 127, 1, 254)
    scales = lax.bitcast_convert_type(
        jnp.left_shift(sexp, 23), jnp.float32
    )
    inv_scales = lax.bitcast_convert_type(
        jnp.left_shift(254 - sexp, 23), jnp.float32
    )
    return _round_half_even(xc * inv_scales) * scales


def _kernel(
    amax_ref, abias_ref, amant_ref, asign_ref,
    rmax_ref, rbias_ref, rmant_ref, rsign_ref,
    x_ref, w_ref, o_ref, acc_ref,
    *, quantize_x: bool, requantize_out: bool, n_k: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    if quantize_x:
        x = quantize_block(
            x, amax_ref[0, 0], abias_ref[0, 0], amant_ref[0, 0], asign_ref[0, 0]
        )
    acc_ref[:] += jnp.dot(
        x.astype(jnp.bfloat16), w_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        out = acc_ref[:]
        if requantize_out:
            out = quantize_block(
                out, rmax_ref[0, 0], rbias_ref[0, 0], rmant_ref[0, 0],
                rsign_ref[0, 0],
            )
        o_ref[:] = out.astype(o_ref.dtype)


def _pad_to(x, mult, axis):
    rem = x.shape[axis] % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, mult - rem)
    return jnp.pad(x, pad)


def _round_up(v: int, mult: int) -> int:
    return -(-v // mult) * mult


@functools.partial(
    jax.jit,
    static_argnames=("quantize_x", "requantize_out", "out_dtype",
                     "bm", "bn", "bk", "vmem_limit_mb"),
)
def fused_quant_matmul(
    x,
    w_q,
    act_params: Optional[Tuple] = None,
    res_params: Optional[Tuple] = None,
    *,
    quantize_x: bool = True,
    requantize_out: bool = False,
    out_dtype=jnp.float32,
    bm: int = 1024,
    bn: int = 2048,
    bk: int = 512,
    vmem_limit_mb: int = 100,
):
    """``requant(quantize(x) @ w_q)`` as one fused TPU kernel.

    Args:
      x: (M, K) activations — float32 unquantized (with ``quantize_x``), or
        already-quantized bfloat16 (``quantize_x=False``, the steady-state
        chained-layer mode where the *previous* layer's requant epilogue did
        the input quantization).
      w_q: (K, N) weights, already on their ExMy grid, as bfloat16 (exact).
      act_params: (maxval, bias, mant_bits, sign_bits) scalars for the
        activation quantizer; required when ``quantize_x``.
      res_params: same for the result requantizer (``res_quantizer``).
      out_dtype: float32, or bfloat16 to emit requantized outputs ready to be
        consumed by the next quantized matmul (exact for mant_width <= 7).

    Returns:
      (M, N) in ``out_dtype``.
    """
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2, (x.shape, w_q.shape)
    assert w_q.dtype == jnp.bfloat16, "pre-quantized weights must be bf16"
    if not quantize_x:
        pass  # x may be bf16 (chained mode) or f32
    else:
        assert x.dtype == jnp.float32, x.dtype

    def scalars(params, like=0.0):
        if params is None:
            z = jnp.zeros((1, 1), jnp.float32)
            zi = jnp.zeros((1, 1), jnp.int32)
            return z, zi, zi, zi
        mv, bias, mant, sign = params
        return (
            jnp.asarray(mv, jnp.float32).reshape(1, 1),
            jnp.asarray(bias, jnp.int32).reshape(1, 1),
            jnp.asarray(mant, jnp.int32).reshape(1, 1),
            jnp.asarray(sign, jnp.int32).reshape(1, 1),
        )

    amax, abias, amant, asign = scalars(act_params)
    rmax, rbias, rmant, rsign = scalars(res_params)

    # Clamp tiles to the (128-aligned) problem so small matmuls don't pad to
    # the large defaults. Defaults were swept on a v5e at 4096^3: the old
    # (256, 256, 512) tiles were HBM-bound (x re-read N/bn = 16 times);
    # (1024, 2048, 512) with a raised Mosaic VMEM budget measures
    # ~155-168 TF/s vs ~110-140 — see scripts/sweep_fused_tiles.py.
    bm = min(bm, _round_up(m, 128))
    bn = min(bn, _round_up(n, 128))
    bk = min(bk, _round_up(k, 128))

    xp = _pad_to(_pad_to(x, bm, 0), bk, 1)
    wp = _pad_to(_pad_to(w_q, bk, 0), bn, 1)
    mp, kp = xp.shape
    np_ = wp.shape[1]
    n_k = kp // bk

    smem = lambda: pl.BlockSpec((1, 1), lambda i, j, kk: (0, 0),
                                memory_space=pltpu.SMEM)

    # interpret mode off-TPU so the same tests run on the CPU mesh
    interpret = jax.default_backend() not in ("tpu", "axon")

    out = pl.pallas_call(
        functools.partial(
            _kernel, quantize_x=quantize_x, requantize_out=requantize_out,
            n_k=n_k,
        ),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            smem(), smem(), smem(), smem(),
            smem(), smem(), smem(), smem(),
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp * x.dtype.itemsize + kp * np_ * 2
                            + mp * np_ * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # Mosaic's default VMEM budget rejects the swept-optimal tiles;
            # the v5e has headroom for them (measured, not OOM in practice)
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(amax, abias, amant, asign, rmax, rbias, rmant, rsign, xp, wp)
    return out[:m, :n]


def quantize_weights_bf16(w_q_f32):
    """Cast calibrated (grid-valued) weights to bf16 for the kernel — exact
    for every ExMy format with mant_width <= 7."""
    return w_q_f32.astype(jnp.bfloat16)
