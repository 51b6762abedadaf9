"""Decode-attention Pallas TPU kernel with in-kernel packed-KV decode.

VERDICT r2 next #7: the serving decode step (T=1) was the one attention path
with no fused option — the einsum path first DECODES the whole packed KV
slab to f32 in XLA (4 B/element written+read back through HBM) and then
runs three masked einsum/softmax passes over it. This kernel streams the
cache ONCE: per (batch, key-block) grid step the K/V tiles load into VMEM
as stored (bf16 grid values or 1-byte ExMy codes, decoded in-VMEM by the
same bits-assembly decode as the weight kernels), scores/softmax/PV run
blockwise with an online softmax, and nothing but the (H, D) context leaves
the kernel. For the uint8 cache the decode step's KV HBM traffic drops 4x
vs decode-in-XLA (1 byte read vs 4 write + 4 read), reclaiming the
packed-KV decode penalty (README: -6.7% at ctx 4096).

Token-major GQA layout as in ``attention.py``: q heads group over kv heads
with static in-VMEM slices; no repeats materialize.

Numerics: QK^T and PV on the MXU from bf16 operands (exact for FP8-grid
K/V), f32 softmax/accumulator — same contract as the einsum path up to
accumulation order.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...numerics.codec import unpack_consts, unpack_exmy_bits
from .fused_matmul import _pad_to, _round_up


def _kernel(len_ref, keb_ref, kss_ref, veb_ref, vss_ref,
            q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, n_heads: int, kv_heads: int, bs: int, n_s: int, scale: float,
            kv_expo: int, kv_mant: int, coded: bool):
    sk = pl.program_id(1)

    @pl.when(sk == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = len_ref[pl.program_id(0), 0]
    base = sk * bs
    k = k_ref[0]                                   # (bs, HK, D)
    v = v_ref[0]
    if coded:
        k = unpack_exmy_bits(k, kv_expo, kv_mant, keb_ref[0, 0],
                             kss_ref[0, 0], dtype=jnp.bfloat16)
        v = unpack_exmy_bits(v, kv_expo, kv_mant, veb_ref[0, 0],
                             vss_ref[0, 0], dtype=jnp.bfloat16)
    else:
        k = k.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)

    groups = n_heads // kv_heads
    pos = base + lax.broadcasted_iota(jnp.int32, (1, bs), 1)   # (1, bs)
    mask = pos < valid
    for hk in range(kv_heads):
        g0, g1 = hk * groups, (hk + 1) * groups
        qg = q_ref[0, g0:g1, :].astype(jnp.bfloat16)           # (G, D)
        kg = k[:, hk, :]                                       # (bs, D)
        vg = v[:, hk, :]
        s = lax.dot_general(
            qg, kg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                              # (G, bs)
        s = jnp.where(mask, s, -1e30)

        m_old = m_ref[g0:g1, :]                                # (G, 128)
        m_blk = jnp.max(s, axis=-1, keepdims=True)             # (G, 1)
        m_new = jnp.maximum(m_old, jnp.broadcast_to(m_blk, m_old.shape))
        corr = jnp.exp(m_old[:, :1] - m_new[:, :1])            # (G, 1)
        p = jnp.exp(s - m_new[:, :1])                          # (G, bs)
        l_ref[g0:g1, :] = (l_ref[g0:g1, :] * corr
                           + jnp.broadcast_to(
                               jnp.sum(p, axis=-1, keepdims=True),
                               m_old.shape))
        pv = jnp.dot(p.astype(jnp.bfloat16), vg,
                     preferred_element_type=jnp.float32)       # (G, D)
        acc_ref[g0:g1, :] = acc_ref[g0:g1, :] * corr + pv
        m_ref[g0:g1, :] = m_new

    @pl.when(sk == n_s - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kv_expo", "kv_mant", "bs", "out_dtype",
                     "vmem_limit_mb"),
)
def decode_attention(
    q,
    k_slab,
    v_slab,
    lengths,
    *,
    k_bias=None,
    v_bias=None,
    kv_expo: Optional[int] = None,
    kv_mant: Optional[int] = None,
    bs: int = 512,
    out_dtype=jnp.float32,
    vmem_limit_mb: int = 100,
):
    """One-token attention over a cache slab, masked per batch.

    Args:
      q: (B, H, D) — the single decode query per slot.
      k_slab/v_slab: (B, S, HK, D) bf16 grid values, or uint8 ExMy codes
        when ``k_bias``/``v_bias`` (per-tensor int32 packing biases) are
        given — decoded in VMEM, 1 B/element of HBM traffic.
      lengths: (B,) int32 — number of VALID keys per slot (for causal
        decode over a cache holding ``length`` tokens plus the just-written
        one, pass ``length + 1``).
      bs: key-block size (S pads up to a multiple).

    Returns (B, H, D) in ``out_dtype``.
    """
    b, h, d = q.shape
    bb, s, hk, dd = k_slab.shape
    assert (bb, dd) == (b, d) and v_slab.shape == k_slab.shape
    assert h % hk == 0
    coded = k_bias is not None
    if coded:
        assert k_slab.dtype == jnp.uint8 and v_bias is not None
        assert kv_expo is not None and kv_mant is not None

    bs = min(bs, _round_up(s, 128))
    sp = _round_up(s, bs)
    kp = _pad_to(k_slab, sp, 1)
    vp = _pad_to(v_slab, sp, 1)
    n_s = sp // bs
    scale = 1.0 / float(d) ** 0.5

    def consts(bias):
        if bias is None:
            return (jnp.zeros((1, 1), jnp.int32),
                    jnp.zeros((1, 1), jnp.float32))
        eb, ss = unpack_consts(
            jnp.asarray(bias, jnp.int32).reshape(1, 1), kv_mant)
        return eb, ss

    keb, kss = consts(k_bias)
    veb, vss = consts(v_bias)
    lens = jnp.asarray(lengths, jnp.int32).reshape(b, 1)

    smem = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.SMEM)
    interpret = jax.default_backend() not in ("tpu", "axon")

    out = pl.pallas_call(
        functools.partial(
            _kernel, n_heads=h, kv_heads=hk, bs=bs, n_s=n_s, scale=scale,
            kv_expo=kv_expo or 0, kv_mant=kv_mant or 0, coded=coded,
        ),
        grid=(b, n_s),
        in_specs=[
            smem((b, 1)),
            smem((1, 1)), smem((1, 1)), smem((1, 1)), smem((1, 1)),
            pl.BlockSpec((1, h, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sp * d,
            bytes_accessed=(2 * b * hk * sp * d * k_slab.dtype.itemsize
                            + 2 * b * h * d * 4),
            transcendentals=b * h * sp,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(lens, keb, kss, veb, vss, q, kp, vp)
    return out


def decode_attention_fits_vmem(s: int, kv_heads: int, head_dim: int,
                               itemsize: int, bs: int = 512,
                               limit_mb: int = 100) -> bool:
    """Trace-time VMEM estimate for the decode kernel's blocks."""
    bs = min(bs, s)
    kv = 2 * 2 * bs * kv_heads * head_dim * itemsize   # k+v, double-buffered
    dec = 2 * bs * kv_heads * head_dim * (2 + 4)       # decoded bf16 + f32 tmp
    return (kv + dec) * 1.5 <= limit_mb * 1024 * 1024
