"""Fused scaled-dot-product attention Pallas TPU kernel (+ requant epilogue).

One pass QK^T -> mask -> softmax -> PV per (batch, q-block) grid step,
whole key axis in VMEM (no online-softmax streaming at S <= ~4k).

**Measured status (round 3, bench_artifacts/)**: at ViT-B/16 batch-32
shape the kernel is ~8x SLOWER than XLA's fused einsum chain
(0.529 vs 0.066 ms interleaved, ``monokernel.json``; the r2 claim that the
kernel won in isolation came from a benchmark whose einsum side XLA had
narrowed — caught by the harness floor check) and loses ~20% END-TO-END on
ViT (``vit_modes.json`` sdpa_fused_speedup 0.794). XLA tiles the (T, T)
score tensor through its own fusions just fine at these lengths. The
models therefore default to the einsum path; ``QuantPhase(fused_sdpa=
True)`` forces this kernel (Llama slab prefill keeps it available where
the score tensor is genuinely large).

**Token-major layout.** Operands are (B, T, H, D) — exactly how the models'
dense projections produce them — NOT the (B, H, T, D) head-major layout of
library attention kernels: the head split is a free reshape view, GQA is a
static head index inside the kernel (no ``jnp.repeat``), and blocks cover
the full (H, D) trailing dims so unaligned S/D need no padding.

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
    longer key axis holding the cache prefix).
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


def sdpa_fits_vmem(t: int, n_heads: int, kv_heads: int, head_dim: int,
                   sk: int, bq: int = 512, limit_mb: int = 100) -> bool:
    """Trace-time estimate of the kernel's VMEM footprint (ADVICE r2 #1).

    The kernel holds per grid step: the whole (Sk, HK, D) K/V slabs (bf16,
    double-buffered across grid steps), one (bq, H, D) q block + (bq, H, D)
    f32 out block, and per unrolled head a (bq, Sk) f32 score tile (live
    ranges overlap across ~3 tiles: scores, p, mask). Callers fall back to
    the einsum path when this exceeds the kernel's ``vmem_limit_bytes`` —
    otherwise a long ``max_seq_len`` or big-head config hits the remote
    Pallas compiler's VMEM-overflow failure (HTTP 500) with no fallback.
    """
    bq = min(t, bq)
    kv_slabs = 2 * 2 * sk * kv_heads * head_dim * 2      # k+v, double-buf
    q_o = bq * n_heads * head_dim * (2 + 4 + 4)          # q bf16, ctx+out f32
    scores = 3 * bq * sk * 4                             # scores/p/mask f32
    return (kv_slabs + q_o + scores) * 1.25 <= limit_mb * 1024 * 1024


def _kernel(rmax_ref, rbias_ref, rmant_ref, rsign_ref, off_ref,
            q_ref, k_ref, v_ref, o_ref,
            *, n_heads: int, kv_heads: int, s_valid: int, bq: int,
            scale: float, causal: bool, with_offsets: bool,
            requantize_out: bool):
    # one grid step = one (batch, q-block); all heads unrolled — per-head
    # programs measured overhead-bound. GQA: q head h reads kv head
    # h // groups (a static in-VMEM slice; no repeat in HBM).
    # offsets ride in as ONE whole-(B,1) SMEM block (TPU lowering requires
    # SMEM block dims divide 8/128 or equal the array's), indexed by batch.
    off = off_ref[pl.program_id(0), 0] if with_offsets else 0
    groups = n_heads // kv_heads
    for h in range(n_heads):
        q = q_ref[0, :, h, :].astype(jnp.bfloat16)            # (bq, D)
        k = k_ref[0, :, h // groups, :].astype(jnp.bfloat16)  # (Sk, D)
        v = v_ref[0, :, h // groups, :].astype(jnp.bfloat16)  # (Sk, D)

        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                             # (bq, Sk)

        sq, sk = scores.shape
        key_pos = lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        mask = key_pos < s_valid
        if causal:
            q_pos = (lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
                     + pl.program_id(1) * bq + off)
            mask &= key_pos <= q_pos
        scores = jnp.where(mask, scores, -1e30)

        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        probs = p / l

        ctx = jnp.dot(probs.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32)     # (bq, D)
        if requantize_out:
            ctx = quantize_block(ctx, rmax_ref[0, 0], rbias_ref[0, 0],
                                 rmant_ref[0, 0], rsign_ref[0, 0])
        o_ref[0, :, h, :] = ctx.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "requantize_out", "out_dtype", "s_valid",
                     "bq", "vmem_limit_mb"),
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
    vmem_limit_mb: int = 100,
):
    """softmax(q k^T / sqrt(D)) v — token-major operands, one (batch,
    q-block) per grid step, whole key axis in VMEM.

    Args:
      q: (B, T, H, D); k/v: (B, S, HK, D) with S >= T allowed (cache slab)
        and HK dividing H (GQA — handled by head indexing in the kernel, no
        repeat). Any float dtype; matmul operands are taken bf16 (what the
        MXU's single-pass f32 dot truncates to anyway), softmax is f32.
      s_valid: number of valid keys (<= S); the padded tail is masked.
        Defaults to S.
      causal: decoder masking (key_pos <= query_pos [+ offsets]).
      offsets: optional (B,) int32 — per-batch position of query row 0
        (the cache prefix length in warm prefill). Only with ``causal``.
      res_params: (maxval, bias, mant, sign) scalars — requantize the
        context onto an FP8 grid in the epilogue (the ``context_site``).
      bq: q rows per grid step; T pads up to a multiple only when T > bq
        (short sequences run unpadded — blocks cover full dims).

    Returns (B, T, H, D) in ``out_dtype``.
    """
    b, t, h, d = q.shape
    assert k.shape[0] == b and k.shape[3] == d and v.shape == k.shape
    hk = k.shape[2]
    assert h % hk == 0, "kv heads must divide q heads (GQA)"
    sk = k.shape[1]
    s_valid = s_valid if s_valid is not None else sk
    scale = 1.0 / float(d) ** 0.5

    # no padding unless q must be blocked (T > bq); trailing (H, D) block
    # dims always equal the array dims, so unaligned S/T/D lower fine
    if t > bq:
        tp = _round_up(t, bq)
        qp = _pad_to(q, tp, 1)
    else:
        tp, bq, qp = t, t, q
    n_q = tp // bq

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
    smem = lambda: pl.BlockSpec((1, 1), lambda i, jq: (0, 0),
                                memory_space=pltpu.SMEM)
    off_spec = pl.BlockSpec((b if with_offsets else 1, 1),
                            lambda i, jq: (0, 0),
                            memory_space=pltpu.SMEM)
    qspec = pl.BlockSpec((1, bq, h, d), lambda i, jq: (i, jq, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = lambda: pl.BlockSpec((1, sk, hk, d), lambda i, jq: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)

    interpret = jax.default_backend() not in ("tpu", "axon")

    out = pl.pallas_call(
        functools.partial(
            _kernel, n_heads=h, kv_heads=hk, s_valid=s_valid, bq=bq,
            scale=scale, causal=causal, with_offsets=with_offsets,
            requantize_out=requantize_out or res_params is not None,
        ),
        grid=(b, n_q),
        in_specs=[smem(), smem(), smem(), smem(), off_spec,
                  qspec, kvspec(), kvspec()],
        out_specs=pl.BlockSpec((1, bq, h, d), lambda i, jq: (i, jq, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, h, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * tp * sk * d,
            bytes_accessed=(2 * b * h * tp * d + 2 * b * hk * sk * d)
            * q.dtype.itemsize,
            transcendentals=b * h * tp * sk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(rmax, rbias, rmant, rsign, off, qp, k, v)
    return out[:, :t] if tp != t else out
