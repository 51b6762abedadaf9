"""Fused scaled-dot-product attention Pallas TPU kernel (+ requant epilogue).

The retarget of the hand-kernel effort at shapes XLA genuinely cannot fuse
(VERDICT r1 next #2): a softmax between two matmuls forces XLA to
materialize the (B, H, S, S) score tensor in HBM THREE+ times (scores write,
softmax read/write, PV read). For ViT-B/16 batch 32 that is ~60 MB per block
per pass — measured as the single largest non-matmul cost of the serving
modes. This kernel computes QK^T -> mask -> softmax -> PV for one (batch,
head-block) per grid step entirely in VMEM: at encoder/serving lengths
(S <= ~4k) a head's K/V tile fits VMEM, so no online-softmax streaming is
needed — one pass, zero HBM traffic for scores.

Epilogue: the context can be requantized onto an activation site's FP8 grid
in the same kernel (``res_params``) — the hijacker protocol's
``context_site`` quantize rides out with the PV matmul instead of another
HBM round trip.

Numerics: QK^T and PV run on the MXU with f32 accumulation from bf16
operands (exact for FP8-grid inputs — same contract as the einsum path);
the softmax itself is f32. Values match the unfused einsum path up to MXU
accumulation order and the bf16 rounding of the probabilities entering PV.

Masking supports the three serving shapes:
  * plain with key-length cap (ViT; padded tail masked via ``s_valid``),
  * causal over one chunk (Llama cold prefill: queries == keys),
  * causal with per-batch offsets over a cache slab (Llama warm/resumed
    prefill: T new queries at positions ``offsets[b] + i`` attend to a
    longer key axis holding the cache prefix — ``kv`` length != q length).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_matmul import _pad_to, _round_up, quantize_block

# Test hook: force the models' fused-SDPA serving branch on a CPU backend
# (the kernel runs in interpret mode there). The branch is normally gated
# to real TPU backends because interpreted Pallas is slow.
FORCE_FUSED = False
# Bench hook: disable the fused branch everywhere (A/B the einsum path).
DISABLE_FUSED = False


def use_fused() -> bool:
    if DISABLE_FUSED:
        return False
    return FORCE_FUSED or jax.default_backend() in ("tpu", "axon")


def _kernel(rmax_ref, rbias_ref, rmant_ref, rsign_ref, off_ref,
            q_ref, k_ref, v_ref, o_ref,
            *, bh: int, s_valid: int, bq: int, scale: float,
            causal: bool, with_offsets: bool, requantize_out: bool):
    # one grid step = one (batch, head-block); all bh heads unrolled —
    # per-head programs measured overhead-bound (384 x ~33 us on ViT-B/16
    # batch 32)
    # offsets ride in as ONE whole-(B,1) SMEM block (TPU lowering requires
    # SMEM block dims divide 8/128 or equal the array's), indexed by batch
    off = off_ref[pl.program_id(0), 0] if with_offsets else 0
    for h in range(bh):
        q = q_ref[0, h].astype(jnp.bfloat16)            # (bq, D)
        k = k_ref[0, h].astype(jnp.bfloat16)            # (Sk, D)
        v = v_ref[0, h].astype(jnp.bfloat16)            # (Sk, D)

        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                       # (bq, Sk)

        sq, sk = scores.shape
        key_pos = lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        mask = key_pos < s_valid
        if causal:
            q_pos = (lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
                     + pl.program_id(2) * bq + off)
            mask &= key_pos <= q_pos
        scores = jnp.where(mask, scores, -1e30)

        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        probs = p / l

        ctx = jnp.dot(probs.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32)   # (bq, D)
        if requantize_out:
            ctx = quantize_block(ctx, rmax_ref[0, 0], rbias_ref[0, 0],
                                 rmant_ref[0, 0], rsign_ref[0, 0])
        o_ref[0, h] = ctx.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "requantize_out", "out_dtype", "s_valid",
                     "bq", "bh", "vmem_limit_mb"),
)
def fused_sdpa(
    q,
    k,
    v,
    *,
    s_valid: Optional[int] = None,
    causal: bool = False,
    offsets=None,
    res_params: Optional[Tuple] = None,
    requantize_out: bool = False,
    out_dtype=jnp.float32,
    bq: int = 512,
    bh: Optional[int] = None,
    vmem_limit_mb: int = 100,
):
    """softmax(q k^T / sqrt(D)) v — one (batch, head-block) per grid step,
    whole key axis in VMEM, q blocked by ``bq`` for long sequences.

    Args:
      q: (B, H, T, D); k/v: (B, H, S, D) with S >= T allowed (cache slab).
        Any float dtype; matmul operands are taken bf16 (what the MXU's
        single-pass f32 dot truncates to anyway), softmax is f32.
      s_valid: number of valid keys (<= S); the padded tail is masked.
        Defaults to S. Padded query rows produce garbage rows that the
        caller slices off.
      causal: decoder masking (key_pos <= query_pos [+ offsets]).
      offsets: optional (B,) int32 — per-batch position of query row 0
        (the cache prefix length in warm prefill). Only with ``causal``.
      res_params: (maxval, bias, mant, sign) scalars — requantize the
        context onto an FP8 grid in the epilogue (the ``context_site``).
      bh: heads per grid step (VMEM knob); defaults to all H.

    Returns (B, H, T, D) in ``out_dtype``.
    """
    b, h, t, d = q.shape
    assert k.shape[0] == b and k.shape[1] == h and k.shape[3] == d, (
        "repeat GQA k/v heads before calling")
    assert v.shape == k.shape
    sk = k.shape[2]
    assert sk >= t or not causal
    s_valid = s_valid if s_valid is not None else sk
    scale = 1.0 / float(d) ** 0.5

    tp = _round_up(t, 128)
    skp = _round_up(sk, 128)
    dp = _round_up(d, 128)
    bq = min(bq, tp)
    bh = h if bh is None else bh
    assert h % bh == 0
    qp = _pad_to(_pad_to(q, tp, 2), dp, 3)
    kp = _pad_to(_pad_to(k, skp, 2), dp, 3)
    vp = _pad_to(_pad_to(v, skp, 2), dp, 3)
    n_q = tp // bq
    n_h = h // bh

    def scalars(params):
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

    rmax, rbias, rmant, rsign = scalars(res_params)
    with_offsets = offsets is not None
    off = (jnp.asarray(offsets, jnp.int32).reshape(b, 1) if with_offsets
           else jnp.zeros((1, 1), jnp.int32))
    smem = lambda: pl.BlockSpec((1, 1), lambda i, jh, jq: (0, 0),
                                memory_space=pltpu.SMEM)
    off_spec = pl.BlockSpec((b if with_offsets else 1, 1),
                            lambda i, jh, jq: (0, 0),
                            memory_space=pltpu.SMEM)
    qspec = pl.BlockSpec((1, bh, bq, dp), lambda i, jh, jq: (i, jh, jq, 0),
                         memory_space=pltpu.VMEM)
    kvspec = lambda: pl.BlockSpec((1, bh, skp, dp),
                                  lambda i, jh, jq: (i, jh, 0, 0),
                                  memory_space=pltpu.VMEM)

    interpret = jax.default_backend() not in ("tpu", "axon")

    out = pl.pallas_call(
        functools.partial(
            _kernel, bh=bh, s_valid=s_valid, bq=bq, scale=scale,
            causal=causal, with_offsets=with_offsets,
            requantize_out=requantize_out or res_params is not None,
        ),
        grid=(b, n_h, n_q),
        in_specs=[smem(), smem(), smem(), smem(), off_spec,
                  qspec, kvspec(), kvspec()],
        out_specs=pl.BlockSpec((1, bh, bq, dp),
                               lambda i, jh, jq: (i, jh, jq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dp), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * tp * skp * dp,
            bytes_accessed=(2 * b * h * tp * dp + 2 * b * h * skp * dp)
            * q.dtype.itemsize,
            transcendentals=b * h * tp * skp,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(rmax, rbias, rmant, rsign, off, qp, kp, vp)
    return out[:, :, :t, :d]
