"""Speculative decoding composed into the PAGED batcher (ROADMAP round-5
"speculative + paged" — the last cell of the serving composition matrix):
slots advance up to k+1 tokens per batched round, KV scatters land in the
slot's pages, and rollback over the page table is pure host bookkeeping
(``lengths`` only advances to the accepted frontier; pages stay owned by
the slot until retire). Greedy output must stay token-identical to the
non-speculative paged batcher (= the dense batcher = the target's own
greedy decode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama
from fp8_quantization_tpu.models.paged_kv import PagedBatcher
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
TINY = LlamaSpec(vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
                 num_kv_heads=1, mlp_dim=32, max_seq_len=64)
PAGE = 8


def _build(spec, seed, rng, packed_kv=False):
    model = QuantizedLlama(qc=_qc(), spec=spec, packed_kv=packed_kv)
    toks = jnp.asarray(rng.integers(0, spec.vocab_size, size=(1, 10)),
                       jnp.int32)
    cache = KVCache.zeros(spec, 1, spec.max_seq_len,
                          dtype=jnp.uint8 if packed_kv else jnp.bfloat16)
    v = model.init(jax.random.key(seed), toks, cache, ESTIMATE)
    _, ups = model.apply(v, toks, cache, ESTIMATE,
                         mutable=["quant", "quant_est"])
    return model, {**v, **ups}


@pytest.fixture(scope="module")
def models():
    rng = np.random.default_rng(7)
    return _build(SPEC, 0, rng), _build(TINY, 1, rng)


PROMPTS = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8, 9, 7, 9]]


def _paged(model, v, **kw):
    kw.setdefault("slots", 4)
    kw.setdefault("num_pages", 48)
    kw.setdefault("page_size", PAGE)
    return PagedBatcher(model, v, SPEC, **kw)


def _serve(batcher, prompts, n=9):
    slots = [batcher.admit(p, max_new_tokens=n) for p in prompts]
    batcher.run_to_completion()
    return [batcher.retire(s) for s in slots]


def test_greedy_token_identical_to_nonspec_paged(models):
    """The speculative paged batcher must emit EXACTLY the non-speculative
    paged batcher's tokens for every slot."""
    (model, v), (dmodel, dv) = models
    want = _serve(_paged(model, v), PROMPTS)
    b = _paged(model, v, draft_model=dmodel, draft_variables=dv,
               draft_spec=TINY, spec_k=3)
    got = _serve(b, PROMPTS)
    assert got == want
    assert all(len(t) == 9 for t in got)  # budget respected mid-round
    assert b.proposed > 0 and b.accepted <= b.proposed


def test_self_draft_acceptance_is_one(models):
    """Target drafting for itself: every proposal accepted through the
    page-table verify path (the paged gather/scatter KV round-trip must be
    value-identical to the draft's dense-slab view)."""
    (model, v), _ = models
    b = _paged(model, v, slots=2, draft_model=model, draft_variables=v,
               draft_spec=SPEC, spec_k=4)
    got = _serve(b, PROMPTS[:2], n=11)
    assert b.acceptance_rate == 1.0
    want = _serve(_paged(model, v, slots=2), PROMPTS[:2], n=11)
    assert got == want


def test_pages_released_after_spec_rounds(models):
    """Speculative rounds allocate pages for the full k+1 frontier; retire
    must release every page the slot ever owned back to the pool."""
    (model, v), (dmodel, dv) = models
    b = _paged(model, v, draft_model=dmodel, draft_variables=dv,
               draft_spec=TINY, spec_k=3)
    free0 = b.allocator.num_free
    _serve(b, PROMPTS)
    assert b.allocator.num_free == free0
    assert not np.any(b.table)  # all table rows cleared


def test_rollback_keeps_pages_for_next_round(models):
    """A round that rejects drafts must NOT free the slot's over-allocated
    pages — the next round writes into them (lengths advances past the old
    frontier only as tokens are accepted)."""
    (model, v), (dmodel, dv) = models
    b = _paged(model, v, slots=1, draft_model=dmodel, draft_variables=dv,
               draft_spec=TINY, spec_k=3)
    s = b.admit(PROMPTS[0], max_new_tokens=12)
    pages_after = []
    while b.step():
        pages_after.append(int(np.count_nonzero(b.table[s])))
    # page ownership is monotone across rounds (rollback never releases)
    assert pages_after == sorted(pages_after)
    out = b.retire(s)
    assert len(out) == 12


def test_composes_with_packed_kv(models):
    """uint8-code paged target pool + uint8 dense draft slab under
    speculative stepping: tokens match the non-speculative packed paged
    batcher."""
    rng = np.random.default_rng(7)
    model, v = _build(SPEC, 0, rng, packed_kv=True)
    dmodel, dv = _build(TINY, 1, rng, packed_kv=True)
    want = _serve(_paged(model, v, slots=2), PROMPTS[:2])
    b = _paged(model, v, slots=2, draft_model=dmodel, draft_variables=dv,
               draft_spec=TINY, spec_k=3)
    assert b.k_pages.dtype == jnp.uint8
    assert b.draft_cache.k.dtype == jnp.uint8
    got = _serve(b, PROMPTS[:2])
    assert got == want


def test_near_capacity_slot_finishes_early(models):
    """A slot within k+1 tokens of max_seq finishes instead of scattering a
    speculative round past its page table."""
    (model, v), (dmodel, dv) = models
    b = _paged(model, v, slots=1, num_pages=10, draft_model=dmodel,
               draft_variables=dv, draft_spec=TINY, spec_k=3)
    prompt = list(np.random.default_rng(0).integers(0, 64, size=40))
    s = b.admit(prompt, max_new_tokens=60)
    b.run_to_completion()
    got = b.retire(s)
    assert len(prompt) + len(got) + b.spec_k + 1 > SPEC.max_seq_len
    assert len(prompt) + len(got) <= SPEC.max_seq_len


def test_stochastic_spec_paged_runs_and_rejects(models):
    """Stochastic sampling through the paged batched spec_accept path: emits
    the requested number of tokens and, with a genuinely different draft,
    the reject/resample path runs."""
    from fp8_quantization_tpu.models.sampling import SamplingParams

    (model, v), (dmodel, dv) = models
    sp = SamplingParams(temperature=0.8, top_k=16)
    b = _paged(model, v, slots=2, sampling=sp, seed=11, draft_model=dmodel,
               draft_variables=dv, draft_spec=TINY, spec_k=3)
    got = _serve(b, PROMPTS[:2], n=8)
    assert all(len(t) == 8 for t in got)
    assert 0 < b.accepted < b.proposed or b.accepted == 0


def _run_sequential(b, prompts, n=6):
    out = []
    for p in prompts:  # sequential so later admissions can hit the cache
        s = b.admit(p, max_new_tokens=n)
        b.run_to_completion()
        out.append(b.retire(s))
    return out


def test_prefix_cache_on_paged(models):
    """Warm paged admission: the cached dense prefix slab scatters into the
    slot's pages and only the remainder prefills — token-identical to the
    cold run, with the second admission hitting the cache."""
    from fp8_quantization_tpu.models.prefix_cache import PrefixCache

    (model, v), _ = models
    rng = np.random.default_rng(3)
    shared = list(rng.integers(0, 64, size=20))
    prompts = [shared + [11, 12, 13], shared + [31, 32]]

    cold = _run_sequential(_paged(model, v, slots=2), prompts)
    pc = PrefixCache(max_tokens=256, bucket=16)
    warm = _run_sequential(_paged(model, v, slots=2, prefix_cache=pc),
                           prompts)
    assert warm == cold
    assert pc.misses == 1 and pc.hits == 1


def test_prefix_cache_composes_with_spec_paged(models):
    """The full composition cell: prefix cache + speculative + paged. The
    target warm-scatters cached pages, the draft cold-prefills its dense
    slab, and tokens match the cold speculative run."""
    from fp8_quantization_tpu.models.prefix_cache import PrefixCache

    (model, v), (dmodel, dv) = models
    rng = np.random.default_rng(3)
    shared = list(rng.integers(0, 64, size=20))
    prompts = [shared + [11, 12, 13], shared + [31, 32]]

    def run(pc):
        b = _paged(model, v, slots=2, draft_model=dmodel, draft_variables=dv,
                   draft_spec=TINY, spec_k=3, prefix_cache=pc)
        return _run_sequential(b, prompts)

    cold = run(None)
    pc = PrefixCache(max_tokens=256, bucket=16)
    warm = run(pc)
    assert warm == cold
    assert pc.misses == 1 and pc.hits == 1


def test_prefix_entries_interchangeable_with_dense(models):
    """A prefix entry STORED by the dense ContinuousBatcher serves a warm
    PAGED admission (the gathered slab layout matches the dense slot
    slice), and the paged output still equals its cold run."""
    from fp8_quantization_tpu.models.prefix_cache import PrefixCache
    from fp8_quantization_tpu.models.serving import ContinuousBatcher

    (model, v), _ = models
    rng = np.random.default_rng(5)
    shared = list(rng.integers(0, 64, size=24))
    p_dense, p_paged = shared + [7, 8], shared + [9]

    cold = _run_sequential(_paged(model, v, slots=2), [p_paged])
    pc = PrefixCache(max_tokens=256, bucket=16)
    d = ContinuousBatcher(model, v, SPEC, slots=2, prefix_cache=pc)
    s = d.admit(p_dense, max_new_tokens=4)
    d.run_to_completion()
    d.retire(s)
    assert pc.misses == 1
    warm = _run_sequential(_paged(model, v, slots=2, prefix_cache=pc),
                           [p_paged])
    assert warm == cold
    assert pc.hits == 1
