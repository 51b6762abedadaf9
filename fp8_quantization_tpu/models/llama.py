"""Quantized Llama-family decoder with FP8 KV-cache (stretch config).

Green-field (BASELINE.json configs[4] — the reference has no LLM support):
a TPU-native Llama-3-style decoder where

* every projection (q/k/v/o, gate/up/down, lm_head) is a ``QuantDense`` with
  the framework's calibrate-then-freeze FP8 sites;
* the KV cache is **FP8-quantized**: K and V pass through their own
  QuantSites at write time and are stored as bfloat16 grid values (exact for
  mant_width <= 7) — halving KV HBM footprint and bandwidth vs f32 while
  keeping the simulation exact;
* decode is a pure function over a cache pytree: (params, cache, tokens) ->
  (logits, cache), jittable and shardable (heads/mlp shard over the
  ``model`` mesh axis, batch over ``data``);
* continuous batching is slot-based: fixed-capacity cache slots with
  per-slot lengths; admit/retire is host-side bookkeeping
  (``serving.ContinuousBatcher``), every device step is a fixed-shape SPMD
  program (no dynamic shapes under jit).

RoPE/GQA/RMSNorm follow the Llama-3 architecture; norms and rotary stay
full-precision (standard FP8 LLM practice).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..config import QuantConfig
from ..numerics.codec import (
    pack_exmy,
    unpack_consts,
    unpack_exmy_bits,
)
from ..ops.layers import QuantDense
from ..quant.sites import FIXED, QuantPhase, QuantSite, decoded


@dataclasses.dataclass(frozen=True)
class LlamaSpec:
    vocab_size: int = 128256
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    mlp_dim: int = 14336
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    max_seq_len: int = 8192

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


LLAMA3_8B = LlamaSpec()
LLAMA_TINY = LlamaSpec(vocab_size=256, hidden_size=64, num_layers=2,
                       num_heads=4, num_kv_heads=2, mlp_dim=128,
                       max_seq_len=64)


class KVCache(NamedTuple):
    """Per-layer stacked KV cache: bf16 FP8-grid values (exact), or uint8
    packed ExMy codes when the model runs with ``packed_kv`` (half the
    footprint; decoded in the attention read)."""

    k: jnp.ndarray        # (L, B, S, H_kv, D) bf16 | uint8
    v: jnp.ndarray        # (L, B, S, H_kv, D) bf16 | uint8
    length: jnp.ndarray   # (B,) int32 — tokens already cached per slot

    @classmethod
    def zeros(cls, spec: LlamaSpec, batch: int,
              max_seq: Optional[int] = None,
              dtype=jnp.bfloat16) -> "KVCache":
        s = max_seq or spec.max_seq_len
        shape = (spec.num_layers, batch, s, spec.num_kv_heads, spec.head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((batch,), jnp.int32),
        )


def _rms_norm(x, gamma, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)) * gamma


def _rope(x, positions, theta):
    """Rotary embedding; x: (B, T, H, D), positions: (B, T)."""
    d = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, jnp.float32) / d))
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B,T,D/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class QuantLlamaBlock(nn.Module):
    qc: QuantConfig
    spec: LlamaSpec
    # (mesh, seq_axis): long-context prefill attention runs as a ring over
    # the mesh axis (parallel/ring_attention.py) instead of the cache gather.
    # Ring prefill is valid only from an empty cache (pure self-attention
    # over the chunk) and needs T divisible by the axis size.
    ring_spec: Optional[tuple] = None
    # store KV as 1-byte packed ExMy codes instead of bf16 grid values:
    # half the cache footprint/bandwidth (2x the slots/context per HBM).
    # Encode uses each site's frozen quantizer bias, adjusted to the
    # true-8-bit grid when the STE bias overflows the field (fp_pack_bias);
    # the read decodes with the same bias, so it requires fixed ranges and
    # quantized activations.
    packed_kv: bool = False

    @nn.compact
    def __call__(self, x, k_cache, v_cache, layer_idx, positions, length,
                 qp: QuantPhase = FIXED, page_table=None,
                 chunk_attention: bool = False):
        """One decoder layer over a token chunk.

        ``chunk_attention`` (static): attend over the chunk's own K/V instead
        of the padded cache slab — valid only for empty-cache prefill
        (length == 0), where it is value-identical (the cache rows [0, t)
        are exactly the chunk) but reads T columns instead of S_max: a 16-
        token admission into an 8192-slot cache does 512x less attention
        work. Cache writes still happen for the decode steps that follow.

        x: (B, T, hidden); positions: (B, T) absolute positions of the chunk;
        length: (B,) cache fill before this chunk. The FULL stacked caches
        are threaded through every layer and written with per-token scatters
        at ``layer_idx`` — never copied wholesale (a per-layer slab copy +
        re-stack would move the entire cache through HBM on every decode
        step, ~2x the step's unavoidable traffic). Two cache layouts:

        * dense (``page_table is None``): k_cache/v_cache are
          (L, B, S, H_kv, D) bf16 slabs indexed by absolute position;
        * paged: k_cache/v_cache are (L, N_pages, page_size, H_kv, D) bf16
          page pools and ``page_table`` (B, max_pages) int32 maps each slot's
          logical page to a physical page (see models/paged_kv.py).

        Returns (y, new_k_cache, new_v_cache).
        """
        s = self.spec
        b, t, _ = x.shape
        hd = s.head_dim
        groups = s.num_heads // s.num_kv_heads

        if self.packed_kv:
            from ..config import QMethod, RangeMethod

            _acfg = self.qc.act_quantizer()
            if _acfg.method != QMethod.fp_quantizer:
                raise ValueError("packed_kv requires the FP quantizer")
            if (self.qc.act_range.method == RangeMethod.MSE
                    and _acfg.fp8.mse_include_mantissa_bits):
                # the MSE estimator could elect different mantissa bits for
                # the k/v sites; the packed encode/decode uses the static
                # config format and would silently corrupt the cache
                raise ValueError(
                    "packed_kv needs a fixed mantissa format — disable "
                    "fp8.mse_include_mantissa_bits with the MSE estimator")
            if _acfg.fp8.allow_unsigned:
                # an unsigned-calibrated site has grid E = n_bits - M, but
                # pack_exmy/unpack_exmy and fp_pack_bias assume the signed
                # layout E = n_bits - 1 - M: clip_of would silently clamp the
                # cache to half the intended range
                raise ValueError(
                    "packed_kv requires signed KV sites — disable "
                    "fp8.allow_unsigned (the packed codec assumes the "
                    "sign+E+M byte layout)")
            _m = int(_acfg.fp8.mantissa_bits)
            _e = _acfg.n_bits - 1 - _m
            if _e < 1 or 1 + _e + _m > 8:
                raise ValueError(
                    f"packed_kv format E{_e}M{_m}+sign must fit one byte")

        gamma1 = self.param("attn_norm", nn.initializers.ones_init(),
                            (s.hidden_size,))
        h = _rms_norm(x, gamma1, s.rms_eps)

        q = QuantDense(qc=self.qc, features=s.num_heads * hd, use_bias=False,
                       name="q_proj")(h, qp)
        k = QuantDense(qc=self.qc, features=s.num_kv_heads * hd,
                       use_bias=False, name="k_proj")(h, qp)
        v = QuantDense(qc=self.qc, features=s.num_kv_heads * hd,
                       use_bias=False, name="v_proj")(h, qp)

        # chained serving: projections may return Coded — dequantize
        # inline before the rope/cache math
        q, k, v = decoded(q), decoded(k), decoded(v)
        q = _rope(q.reshape(b, t, s.num_heads, hd), positions, s.rope_theta)
        k = _rope(k.reshape(b, t, s.num_kv_heads, hd), positions, s.rope_theta)
        v = v.reshape(b, t, s.num_kv_heads, hd)

        # FP8-quantize K/V before caching (the FP8 KV cache): own sites,
        # stored bf16 (exact for the grid) or uint8 codes (packed_kv)
        kb = vb = None
        if qp.quant_a:
            ksite = QuantSite(self.qc.act_quantizer(), self.qc.act_range,
                              name="k_cache_quantizer")
            vsite = QuantSite(self.qc.act_quantizer(), self.qc.act_range,
                              name="v_cache_quantizer")
            k = ksite(k, qp)
            v = vsite(v, qp)
            if self.packed_kv:
                kb = ksite.fp_pack_bias()[0]
                vb = vsite.fp_pack_bias()[0]
        elif self.packed_kv:
            raise ValueError("packed_kv requires quantized activations")

        if self.packed_kv:
            acfg = self.qc.act_quantizer()
            kv_mant = int(acfg.fp8.mantissa_bits)
            kv_expo = acfg.n_bits - 1 - kv_mant
            store = lambda t, bb: pack_exmy(
                t.astype(jnp.float32), kv_expo, kv_mant, bb, clip_of=True)

            def load(t, bb):
                # bits-assembly decode (bit-exact with unpack_exmy, ~25%
                # fewer VPU ops) — the KV decode runs over the WHOLE cache
                # every decode step, so its op count is tokens/s
                eb, ss = unpack_consts(bb, kv_mant)
                return unpack_exmy_bits(t, kv_expo, kv_mant, eb, ss)
        else:
            store = lambda t, bb: t.astype(jnp.bfloat16)
            load = lambda t, bb: t.astype(jnp.float32)

        if page_table is None:
            # dense: write the chunk at [length, length+t) per slot into this
            # layer's slab of the full cache with contiguous
            # dynamic_update_slice ops (in-place when the cache buffer is
            # loop-carried or donated; a gather-scatter here measured ~25%
            # slower at prefill chunk sizes)
            k_st = store(k, kb)
            v_st = store(v, vb)

            def write_slot(bi, caches):
                kc, vc = caches
                start = (layer_idx, bi, length[bi], 0, 0)
                kc = lax.dynamic_update_slice(kc, k_st[bi][None, None], start)
                vc = lax.dynamic_update_slice(vc, v_st[bi][None, None], start)
                return kc, vc

            k_cache, v_cache = lax.fori_loop(
                0, b, write_slot, (k_cache, v_cache), unroll=True)
            s_max = k_cache.shape[2]
            from ..ops.pallas.decode_attention import (
                decode_attention_fits_vmem)

            # measured r3 (bench_artifacts/llama_decode_kernel.json): the
            # decode-attention kernel runs 0.394x the XLA einsum decode at
            # B=8/ctx 4096 on the v5e — the (G, bs) per-head dots
            # underutilize the MXU while XLA fuses the whole slab matvec at
            # full HBM bandwidth. Default OFF; ``qp.fused_sdpa=True``
            # forces the kernel (it still wins the VMEM-decode story only
            # when something upstream prevents the XLA fusion).
            allow_k = qp.fused_sdpa is True
            use_dec = (t == 1 and qp.fast and not qp.estimating and allow_k
                       and decode_attention_fits_vmem(
                           s_max, s.num_kv_heads, hd,
                           k_cache.dtype.itemsize))
            if use_dec:
                kf = vf = None  # the kernel reads the raw slabs below
            else:
                kf = load(k_cache[layer_idx], kb)
                vf = load(v_cache[layer_idx], vb)
        else:
            # paged: scatter the chunk into physical pages, gather the slot's
            # logical view back for attention. Unallocated table entries point
            # at the reserved trash page 0, so padded/idle writes are inert.
            page = k_cache.shape[2]
            pp = jnp.take_along_axis(page_table, positions // page, axis=1)
            off = positions % page
            k_cache = k_cache.at[layer_idx, pp, off].set(store(k, kb))
            v_cache = v_cache.at[layer_idx, pp, off].set(store(v, vb))
            s_max = page_table.shape[1] * page
            kf = load(k_cache[layer_idx][page_table].reshape(
                b, s_max, s.num_kv_heads, hd), kb)
            vf = load(v_cache[layer_idx][page_table].reshape(
                b, s_max, s.num_kv_heads, hd), vb)
            use_dec = False

        if self.ring_spec is not None and t > 1:
            # ring prefill: exact sequence-parallel self-attention over the
            # chunk (K/V blocks rotate over ICI; online softmax) — the cache
            # prefix must be empty (length == 0)
            from ..parallel.ring_attention import ring_attention

            mesh, seq_axis = self.ring_spec
            ctx = ring_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), mesh, seq_axis=seq_axis, causal=True,
            )
            ctx = ctx.reshape(b, t, s.num_heads * hd)
            attn_out = QuantDense(qc=self.qc, features=s.hidden_size,
                                  use_bias=False, name="o_proj")(ctx, qp)
            x = x + decoded(attn_out).astype(jnp.float32)
            return self._mlp(x, qp), k_cache, v_cache

        from ..ops.pallas.attention import sdpa_fits_vmem

        qg = q.reshape(b, t, s.num_kv_heads, groups, hd)
        # measured r3 (bench_artifacts/llama_prefill_sdpa.json): the fused
        # SDPA kernel runs 0.872x the XLA einsum prefill at T=1024 on the
        # v5e (einsum 8.83 ms = 116k tok/s vs kernel 10.05 ms) — like ViT
        # and decode, XLA's own fusion of the attention chain wins. Default
        # OFF everywhere; ``qp.fused_sdpa=True`` forces the kernel, with a
        # trace-time VMEM estimate falling back to the einsum path for
        # slabs the kernel can't hold (ADVICE r2 #1)
        allow = qp.fused_sdpa is True
        fused_base = t > 1 and qp.fast and not qp.estimating and allow
        if chunk_attention and t > 1:
            # empty-cache prefill: the chunk IS the cache prefix; the store/
            # load round-trip matches the cache readback bit-for-bit
            fused = fused_base and sdpa_fits_vmem(
                t, s.num_heads, s.num_kv_heads, hd, t)
            kf = load(store(k, kb), kb)                        # (B, T, K, D)
            vf = load(store(v, vb), vb)
            if fused:
                ctx = self._fused_ctx(qg, kf, vf, offsets=None)
            else:
                scores = jnp.einsum("btkgd,bukd->btkgu", qg, kf) / jnp.sqrt(
                    jnp.asarray(hd, jnp.float32)
                )
                causal = jnp.tril(jnp.ones((t, t), bool))      # (T_q, U_key)
                scores = jnp.where(causal[None, :, None, None, :], scores,
                                   -1e30)
                probs = jax.nn.softmax(scores, axis=-1)
                ctx = jnp.einsum("btkgu,bukd->btkgd", probs, vf)
                ctx = ctx.reshape(b, t, s.num_heads * hd)
        elif fused_base and sdpa_fits_vmem(t, s.num_heads, s.num_kv_heads,
                                           hd, s_max):
            # warm/resumed prefill over the cache slab: T new queries at
            # positions length[b]+i attend to keys [0, length[b]+i] — the
            # kernel's per-batch causal ``offsets`` (the key axis is the
            # whole slab; the causal cap masks the garbage tail)
            ctx = self._fused_ctx(qg, kf, vf, offsets=length)
        elif use_dec:
            from ..ops.pallas.decode_attention import decode_attention

            dec_kw = (dict(k_bias=kb, v_bias=vb, kv_expo=kv_expo,
                           kv_mant=kv_mant) if self.packed_kv else {})
            ctx = decode_attention(
                q[:, 0], k_cache[layer_idx], v_cache[layer_idx],
                length + 1, **dec_kw)
            ctx = ctx.reshape(b, 1, s.num_heads * hd)
        else:
            # attention over the (logical) cache prefix [0, length + t)
            # (B, T, H, D) x (B, S, H_kv, D) with GQA head grouping
            scores = jnp.einsum("btkgd,bskd->btkgs", qg, kf) / jnp.sqrt(
                jnp.asarray(hd, jnp.float32)
            )
            key_pos = jnp.arange(s_max)[None, :]                 # (1, S)
            valid = key_pos[:, None, :] <= positions[..., None]  # (B, T, S)
            valid &= key_pos[:, None, :] < (length[:, None, None] + t)
            scores = jnp.where(valid[:, :, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("btkgs,bskd->btkgd", probs, vf)
            ctx = ctx.reshape(b, t, s.num_heads * hd)

        attn_out = QuantDense(qc=self.qc, features=s.hidden_size,
                              use_bias=False, name="o_proj")(ctx, qp)
        x = x + decoded(attn_out).astype(jnp.float32)
        return self._mlp(x, qp), k_cache, v_cache

    def _fused_ctx(self, qg, kf, vf, offsets):
        """Context via the fused SDPA kernel (bf16 operands, f32 softmax).

        qg: (B, T, K, G, D) grouped queries; kf/vf: (B, S, K, D) keys/values
        (S == T for the cold-prefill chunk, the full cache slab otherwise).
        Everything is already token-major — the head merge is a free
        reshape and GQA is handled inside the kernel (no repeat/transpose
        materializes in HBM).
        """
        from ..ops.pallas.attention import fused_sdpa

        s = self.spec
        b, t = qg.shape[0], qg.shape[1]
        hd = qg.shape[-1]
        ctx = fused_sdpa(
            qg.reshape(b, t, s.num_heads, hd).astype(jnp.bfloat16),
            kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16),
            causal=True, offsets=offsets)
        return ctx.reshape(b, t, s.num_heads * hd)

    def _mlp(self, x, qp: QuantPhase):
        s = self.spec
        gamma2 = self.param("mlp_norm", nn.initializers.ones_init(),
                            (s.hidden_size,))
        h = _rms_norm(x, gamma2, s.rms_eps)
        gate = QuantDense(qc=self.qc, features=s.mlp_dim, use_bias=False,
                          name="gate_proj")(h, qp)
        up = QuantDense(qc=self.qc, features=s.mlp_dim, use_bias=False,
                        name="up_proj")(h, qp)
        down = QuantDense(qc=self.qc, features=s.hidden_size, use_bias=False,
                          name="down_proj")(
            jax.nn.silu(decoded(gate).astype(jnp.float32))
            * decoded(up).astype(jnp.float32),
            qp)
        return x + decoded(down).astype(jnp.float32)


class QuantizedLlama(nn.Module):
    """Llama decoder: one call handles prefill (T tokens) or decode (T=1)."""

    qc: QuantConfig
    spec: LlamaSpec = LLAMA_TINY
    # (mesh, seq_axis) for ring-attention prefill (see QuantLlamaBlock);
    # only use when calling with an EMPTY cache and T % axis_size == 0
    ring_spec: Optional[tuple] = None
    # uint8 packed-code KV cache (see QuantLlamaBlock.packed_kv); build the
    # cache with ``KVCache.zeros(..., dtype=jnp.uint8)``
    packed_kv: bool = False

    @nn.compact
    def __call__(self, tokens, cache, qp: QuantPhase = FIXED,
                 chunk_attention: bool = False):
        """tokens: (B, T) int32 appended after ``cache.length``. ``cache`` is
        a dense ``KVCache`` or a ``paged_kv.PagedKVCache``. Returns
        (logits (B, T, vocab), updated cache of the same type).

        ``chunk_attention``: static empty-cache-prefill fast path — see
        ``QuantLlamaBlock``."""
        s = self.spec
        b, t = tokens.shape
        positions = cache.length[:, None] + jnp.arange(t)[None, :]
        paged = hasattr(cache, "page_table")
        page_table = cache.page_table if paged else None

        embed = self.param("embed", nn.initializers.normal(0.02),
                           (s.vocab_size, s.hidden_size))
        x = embed[tokens]

        k_full = cache.k_pages if paged else cache.k
        v_full = cache.v_pages if paged else cache.v
        for i in range(s.num_layers):
            x, k_full, v_full = QuantLlamaBlock(
                qc=self.qc, spec=s, ring_spec=self.ring_spec,
                packed_kv=self.packed_kv, name=f"layer_{i}"
            )(x, k_full, v_full, i, positions, cache.length, qp, page_table,
              chunk_attention)

        gamma = self.param("final_norm", nn.initializers.ones_init(),
                           (s.hidden_size,))
        x = _rms_norm(x, gamma, s.rms_eps)
        logits = QuantDense(qc=self.qc, features=s.vocab_size, use_bias=False,
                            quantize_output=False, name="lm_head")(x, qp)

        if paged:
            cache = type(cache)(
                k_pages=k_full, v_pages=v_full,
                page_table=page_table, length=cache.length + t,
            )
        else:
            cache = KVCache(k=k_full, v=v_full, length=cache.length + t)
        return decoded(logits), cache
