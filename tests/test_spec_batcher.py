"""Speculative decoding composed INTO the continuous batcher (VERDICT r4
next #3): slots advance up to k+1 tokens per batched round with per-slot
rollback, and the serving features compose — prefix cache, packed KV,
sampling — while greedy output stays token-identical to the
non-speculative batcher (= the target's own greedy decode)."""

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
TINY = LlamaSpec(vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
                 num_kv_heads=1, mlp_dim=32, max_seq_len=64)


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


def _serve(batcher, prompts, n=9):
    slots = [batcher.admit(p, max_new_tokens=n) for p in prompts]
    batcher.run_to_completion()
    return [batcher.retire(s) for s in slots]


def test_greedy_token_identical_to_nonspec(models):
    """The speculative batcher must emit EXACTLY the non-speculative
    batcher's tokens for every slot (greedy verification preserves the
    target's greedy decode regardless of the draft)."""
    (model, v), (dmodel, dv) = models
    want = _serve(ContinuousBatcher(model, v, SPEC, slots=4), PROMPTS)
    b = ContinuousBatcher(model, v, SPEC, slots=4, draft_model=dmodel,
                          draft_variables=dv, draft_spec=TINY, spec_k=3)
    got = _serve(b, PROMPTS)
    assert got == want
    assert all(len(t) == 9 for t in got)  # budget respected mid-round
    assert b.proposed > 0 and b.accepted <= b.proposed


def test_self_draft_acceptance_is_one(models):
    """Target drafting for itself: every proposal accepted, so each slot
    finishes in ~n/(k+1) rounds and acceptance_rate == 1."""
    (model, v), _ = models
    b = ContinuousBatcher(model, v, SPEC, slots=2, draft_model=model,
                          draft_variables=v, draft_spec=SPEC, spec_k=4)
    got = _serve(b, PROMPTS[:2], n=11)
    assert b.acceptance_rate == 1.0
    want = _serve(ContinuousBatcher(model, v, SPEC, slots=2), PROMPTS[:2],
                  n=11)
    assert got == want


def test_staggered_admission(models):
    """Slots admitted mid-flight join the batched speculative rounds; each
    slot's output is independent of its co-tenants (== the solo-serve
    output)."""
    (model, v), (dmodel, dv) = models

    def solo(p):
        b = ContinuousBatcher(model, v, SPEC, slots=4, draft_model=dmodel,
                              draft_variables=dv, draft_spec=TINY, spec_k=3)
        return _serve(b, [p])[0]

    want = [solo(p) for p in PROMPTS]

    b = ContinuousBatcher(model, v, SPEC, slots=4, draft_model=dmodel,
                          draft_variables=dv, draft_spec=TINY, spec_k=3)
    s0 = b.admit(PROMPTS[0], max_new_tokens=9)
    s1 = b.admit(PROMPTS[1], max_new_tokens=9)
    b.step()  # both slots advance at least one token
    s2 = b.admit(PROMPTS[2], max_new_tokens=9)
    b.run_to_completion()
    got = [b.retire(s) for s in (s0, s1, s2)]
    assert got == want


def test_composes_with_prefix_cache(models):
    """Warm prefix admission + speculative stepping: the target warm-splices
    cached KV, the draft cold-prefills, and tokens match the cold run."""
    from fp8_quantization_tpu.models.prefix_cache import PrefixCache

    (model, v), (dmodel, dv) = models
    rng = np.random.default_rng(3)
    shared = list(rng.integers(0, 64, size=20))
    prompts = [shared + [11, 12, 13], shared + [31, 32]]

    def run(pc):
        b = ContinuousBatcher(model, v, SPEC, slots=2, draft_model=dmodel,
                              draft_variables=dv, draft_spec=TINY, spec_k=3,
                              prefix_cache=pc)
        out = []
        for p in prompts:  # sequential so the second admission hits
            s = b.admit(p, max_new_tokens=6)
            b.run_to_completion()
            out.append(b.retire(s))
        return out

    cold = run(None)
    pc = PrefixCache(max_tokens=256, bucket=16)
    warm = run(pc)
    assert warm == cold
    assert pc.misses == 1 and pc.hits == 1


def test_composes_with_packed_kv(models):
    """Packed (uint8-code) KV caches on BOTH target and draft under
    speculative stepping: rollback works on byte slabs, tokens match the
    non-speculative packed batcher."""
    rng = np.random.default_rng(7)
    model, v = _build(SPEC, 0, rng, packed_kv=True)
    dmodel, dv = _build(TINY, 1, rng, packed_kv=True)
    want = _serve(ContinuousBatcher(model, v, SPEC, slots=2), PROMPTS[:2])
    b = ContinuousBatcher(model, v, SPEC, slots=2, draft_model=dmodel,
                          draft_variables=dv, draft_spec=TINY, spec_k=3)
    assert b.cache.k.dtype == jnp.uint8
    assert b.draft_cache.k.dtype == jnp.uint8
    got = _serve(b, PROMPTS[:2])
    assert got == want


def test_eos_truncates_mid_round(models):
    """An EOS token emitted inside an accepted run must stop that slot
    immediately (tokens after EOS in the same round are dropped)."""
    (model, v), (dmodel, dv) = models
    # pick a prompt whose greedy decode has a token with a FIRST occurrence
    # past position 0 (greedy decodes of random models cycle, so a single
    # prompt may yield a constant repeat with nothing to cut at)
    for prompt in PROMPTS + [[7, 7, 2], [1, 2, 3, 4]]:
        ref = _serve(ContinuousBatcher(model, v, SPEC, slots=1), [prompt],
                     n=9)[0]
        cut = next((i for i in range(1, len(ref)) if ref[i] not in ref[:i]),
                   None)
        if cut is not None:
            break
    else:
        pytest.skip("no greedy sequence with a late-first-occurrence token")
    eos = ref[cut]
    b = ContinuousBatcher(model, v, SPEC, slots=1, eos_token=eos,
                          draft_model=dmodel, draft_variables=dv,
                          draft_spec=TINY, spec_k=3)
    s = b.admit(prompt, max_new_tokens=9)
    b.run_to_completion()
    got = b.retire(s)
    assert got == ref[: cut + 1]  # up to and including the first EOS


def test_near_capacity_slot_finishes_early(models):
    """A slot within k+1 tokens of max_seq finishes instead of overflowing
    the cache slab with a speculative round."""
    (model, v), (dmodel, dv) = models
    b = ContinuousBatcher(model, v, SPEC, slots=1, draft_model=dmodel,
                          draft_variables=dv, draft_spec=TINY, spec_k=3)
    prompt = list(np.random.default_rng(0).integers(0, 64, size=40))
    s = b.admit(prompt, max_new_tokens=60)
    b.run_to_completion()
    got = b.retire(s)
    assert len(prompt) + len(got) + b.spec_k + 1 > SPEC.max_seq_len
    assert len(prompt) + len(got) <= SPEC.max_seq_len


def test_stochastic_spec_batcher_runs_and_rejects(models):
    """Stochastic sampling through the batched spec_accept path: emits the
    requested number of tokens, and with a genuinely different draft the
    reject/resample path runs (accepted < proposed)."""
    from fp8_quantization_tpu.models.sampling import SamplingParams

    (model, v), (dmodel, dv) = models
    sp = SamplingParams(temperature=0.8, top_k=16)
    b = ContinuousBatcher(model, v, SPEC, slots=2, sampling=sp, seed=11,
                          draft_model=dmodel, draft_variables=dv,
                          draft_spec=TINY, spec_k=3)
    got = _serve(b, PROMPTS[:2], n=8)
    assert all(len(t) == 8 for t in got)
    assert 0 < b.accepted < b.proposed or b.accepted == 0
