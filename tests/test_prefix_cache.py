"""Prefix caching: KV reuse across requests sharing a prompt prefix."""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama
from fp8_quantization_tpu.models.prefix_cache import PrefixCache
from fp8_quantization_tpu.models.serving import ContinuousBatcher
from fp8_quantization_tpu.quant import ESTIMATE


def _qc():
    return QuantConfig(
        method=QMethod.fp_quantizer, quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )


SPEC = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                 num_kv_heads=2, mlp_dim=64, max_seq_len=64)


def _calibrated(rng):
    model = QuantizedLlama(qc=_qc(), spec=SPEC)
    toks = jnp.asarray(rng.integers(0, 64, size=(2, 12)), jnp.int32)
    cache = KVCache.zeros(SPEC, 2, SPEC.max_seq_len)
    v = model.init(jax.random.key(0), toks, cache, ESTIMATE)
    _, ups = model.apply(v, toks, cache, ESTIMATE,
                         mutable=["quant", "quant_est"])
    return model, {**v, **ups}


def test_lookup_longest_and_lru():
    pc = PrefixCache(max_tokens=64, bucket=4)
    k = jnp.zeros((2, 1, 32, 2, 8), jnp.bfloat16)
    v = jnp.zeros_like(k)
    assert pc.store(list(range(8)), k, v) == 8
    assert pc.store(list(range(16)), k, v) == 16
    # longest matching prefix wins
    lp, _, _ = pc.lookup(list(range(16)) + [99])
    assert lp == 16
    # a full-prompt match drops a whole bucket (at least one token must
    # remain to prefill, and results stay bucket-aligned so the warm
    # admission jit specializes on few distinct prefix lengths)
    lp, _, _ = pc.lookup(list(range(8)) + [1, 2])
    assert lp == 8
    lp, _, _ = pc.lookup(list(range(8)))
    assert lp == 4
    assert pc.lookup([7, 7, 7]) is None
    # eviction on token budget (64): adding 48 evicts the LRU entry
    pc.store([5] * 48 + list(range(3)), k[:, :, :48], v[:, :, :48])
    assert pc.cached_tokens <= 64


def test_prefix_cached_admission_matches_cold(rng):
    model, v = _calibrated(rng)
    shared = list(rng.integers(0, 64, size=20))
    p1 = shared + [11, 12, 13]
    p2 = shared + [31, 32]

    def run(prefix_cache, prompts):
        b = ContinuousBatcher(model, v, SPEC, slots=2,
                              max_seq=SPEC.max_seq_len,
                              prefix_cache=prefix_cache)
        out = []
        for p in prompts:
            s = b.admit(p, max_new_tokens=6)
            b.run_to_completion()
            out.append(b.retire(s))
        return out

    cold = run(None, [p1, p2])
    pc = PrefixCache(max_tokens=256, bucket=16)
    warm = run(pc, [p1, p2])
    assert warm == cold
    # p1 missed (nothing cached), p2 hit the stored 16-token bucket
    assert pc.misses == 1 and pc.hits == 1


def test_prefix_cache_with_packed_kv(rng):
    """Prefix reuse stores/copies the uint8 code slabs unchanged."""
    from fp8_quantization_tpu.quant.sites import QuantPhase

    model = QuantizedLlama(qc=_qc(), spec=SPEC, packed_kv=True)
    toks = jnp.asarray(rng.integers(0, 64, size=(2, 12)), jnp.int32)
    cache = KVCache.zeros(SPEC, 2, SPEC.max_seq_len, dtype=jnp.uint8)
    v = model.init(jax.random.key(0), toks, cache, ESTIMATE)
    _, ups = model.apply(v, toks, cache, ESTIMATE,
                         mutable=["quant", "quant_est"])
    v = {**v, **ups}

    shared = list(rng.integers(0, 64, size=16))
    p1 = shared + [1, 2]
    p2 = shared + [3]

    def run(pc):
        b = ContinuousBatcher(model, v, SPEC, slots=2,
                              max_seq=SPEC.max_seq_len, prefix_cache=pc)
        out = []
        for p in (p1, p2):
            s = b.admit(p, max_new_tokens=5)
            b.run_to_completion()
            out.append(b.retire(s))
        return out

    pc = PrefixCache(bucket=16)
    assert run(pc) == run(None)
    assert pc.hits == 1


def test_shared_prefix_with_unique_tails():
    """Entries stored from one request's FULL prompt (unique tail included)
    must serve siblings sharing only the system-prompt part — the lookup
    slices the slab to the common bucket-aligned prefix."""
    pc = PrefixCache(max_tokens=256, bucket=16)
    shared = list(range(100, 132))  # 32 shared tokens
    k = jnp.arange(2 * 1 * 48 * 2 * 4, dtype=jnp.int32).reshape(
        2, 1, 48, 2, 4).astype(jnp.bfloat16)
    v = -k
    pc.store(shared + [1, 2, 3, 4], k, v)       # 36 tokens, unique tail
    hit = pc.lookup(shared + [9, 9])            # different tail
    assert hit is not None
    lp, kh, vh = hit
    assert lp == 32
    np.testing.assert_array_equal(np.asarray(kh),
                                  np.asarray(k[:, :, :32]))
    # and the bench scenario: prompt length a bucket multiple
    pc2 = PrefixCache(max_tokens=2048, bucket=16)
    shared2 = list(range(64))
    pc2.store(shared2 + list(range(200, 216)), k, v)  # 80 tokens total
    hit2 = pc2.lookup(shared2 + list(range(300, 316)))
    assert hit2 is not None and hit2[0] == 64


def test_store_cap_protects_shared_entries():
    """One long unique prompt must not evict every shared system-prompt
    entry: store() caps each entry at max_entry_tokens."""
    pc = PrefixCache(max_tokens=64, bucket=4, max_entry_tokens=16)
    k = jnp.zeros((2, 1, 64, 2, 8), jnp.bfloat16)
    v = jnp.zeros_like(k)
    assert pc.store(list(range(8)), k, v) == 8          # the shared entry
    # a unique prompt >= the whole budget stores only its capped head
    assert pc.store(list(range(1000, 1064)), k, v) == 16
    assert pc.lookup(list(range(8)) + [1]) is not None  # survived


def test_warm_admission_overflow_falls_back_to_cold(rng):
    """A prompt whose padded remainder would spill past max_seq must take
    the cold prefill (the slice-start clamp would otherwise smear pad
    garbage over the tail of the valid prefix KV)."""
    model, v = _calibrated(rng)
    # a prefix-cache bucket (4) finer than the serving pad bucket (16) can
    # produce lp + pad(rem) > max_seq even when the prompt itself fits
    shared = list(rng.integers(0, 64, size=52))
    p1 = shared + [1, 2]                 # stores the 52-token prefix
    p_over = shared + list(range(11))    # 63 real; lp=52, rem pads 16 -> 68
    pc = PrefixCache(max_tokens=512, bucket=4, max_entry_tokens=512)

    def run(pc_, prompts):
        b = ContinuousBatcher(model, v, SPEC, slots=2,
                              max_seq=SPEC.max_seq_len, prefix_cache=pc_)
        out = []
        for p in prompts:
            s = b.admit(p, max_new_tokens=1)
            out.append(b.retire(s))
        return out

    assert run(pc, [p1, p_over]) == run(None, [p1, p_over])


def test_packed_kv_rejects_unsigned_sites():
    """allow_unsigned breaks the packed byte layout (E = n_bits - M vs the
    signed E = n_bits - 1 - M pack_exmy assumes) — must raise, not corrupt."""
    from dataclasses import replace as dc_replace

    import pytest

    qc = _qc()
    qc = dc_replace(qc, fp8=dc_replace(qc.fp8, allow_unsigned=True))
    model = QuantizedLlama(qc=qc, spec=SPEC, packed_kv=True)
    toks = jnp.zeros((1, 4), jnp.int32)
    cache = KVCache.zeros(SPEC, 1, SPEC.max_seq_len, dtype=jnp.uint8)
    with pytest.raises(ValueError, match="allow_unsigned"):
        model.init(jax.random.key(0), toks, cache, ESTIMATE)


def test_speculative_draft_cache_has_no_zero_rows(rng):
    """After a fully-accepted round, every valid draft-cache position must
    hold real KV (the proposal scan feeds the last draft token too)."""
    from fp8_quantization_tpu.models.speculative import SpeculativeDecoder
    from fp8_quantization_tpu.quant import FIXED

    model, v = _calibrated(rng)
    sd = SpeculativeDecoder(model, v, SPEC, model, v, SPEC, k=4)
    prompt = [3, 1, 4, 1, 5]
    t_cur, d_cache = sd._prefill(model, v, SPEC, sd.qp, prompt)
    drafts, d_cache = sd._propose(v, d_cache, t_cur)
    # positions len(prompt) .. len(prompt)+k must all be written (nonzero
    # for a real model's K projections)
    ks = np.asarray(d_cache.k[:, 0, len(prompt): len(prompt) + 5],
                    np.float32)
    assert (np.abs(ks).sum(axis=(0, 2, 3)) > 0).all()
