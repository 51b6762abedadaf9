"""Speculative decoding: exactness vs pure greedy, acceptance accounting."""

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
from fp8_quantization_tpu.models.speculative import SpeculativeDecoder
from fp8_quantization_tpu.quant import ESTIMATE, FIXED


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


def _build(spec, seed, rng):
    model = QuantizedLlama(qc=_qc(), spec=spec)
    toks = jnp.asarray(rng.integers(0, spec.vocab_size, size=(1, 10)),
                       jnp.int32)
    cache = KVCache.zeros(spec, 1, spec.max_seq_len)
    v = model.init(jax.random.key(seed), toks, cache, ESTIMATE)
    _, ups = model.apply(v, toks, cache, ESTIMATE,
                         mutable=["quant", "quant_est"])
    return model, {**v, **ups}


def _pure_greedy(model, variables, spec, prompt, n):
    cache = KVCache.zeros(spec, 1, spec.max_seq_len)
    toks = jnp.asarray(np.asarray(prompt, np.int32)[None, :])
    logits, cache = model.apply(variables, toks, cache, FIXED)
    out = [int(jnp.argmax(logits[0, -1]))]
    while len(out) < n:
        logits, cache = model.apply(
            variables, jnp.asarray([[out[-1]]], jnp.int32), cache, FIXED)
        out.append(int(jnp.argmax(logits[0, -1])))
    return out


@pytest.fixture(scope="module")
def models():
    rng = np.random.default_rng(7)
    target = _build(SPEC, 0, rng)
    draft = _build(TINY, 1, rng)
    return target, draft


def test_self_draft_accepts_everything(models):
    """Draft == target: every proposal accepted, output == pure greedy, and
    the target runs ~n/(k+1) forwards instead of n."""
    (model, v), _ = models
    prompt = [3, 1, 4, 1, 5]
    n = 17
    sd = SpeculativeDecoder(model, v, SPEC, model, v, SPEC, k=4)
    toks, stats = sd.generate(prompt, max_new_tokens=n)
    assert toks == _pure_greedy(model, v, SPEC, prompt, n)
    assert stats.acceptance_rate == 1.0
    assert stats.target_steps <= -(-(n - 1) // 5) + 1


def test_random_draft_is_still_exact(models):
    """ANY draft preserves the target's greedy output exactly — only the
    step count changes."""
    (model, v), (dmodel, dv) = models
    prompt = [9, 8, 7]
    n = 15
    sd = SpeculativeDecoder(model, v, SPEC, dmodel, dv, TINY, k=3)
    toks, stats = sd.generate(prompt, max_new_tokens=n)
    assert toks == _pure_greedy(model, v, SPEC, prompt, n)
    assert 0.0 <= stats.acceptance_rate <= 1.0
    assert stats.proposed == stats.target_steps * 3


@pytest.mark.parametrize("k", [1, 2, 5])
def test_exactness_across_k(models, k):
    (model, v), (dmodel, dv) = models
    prompt = [2, 4, 6, 8]
    n = 12
    sd = SpeculativeDecoder(model, v, SPEC, dmodel, dv, TINY, k=k)
    toks, _ = sd.generate(prompt, max_new_tokens=n)
    assert toks == _pure_greedy(model, v, SPEC, prompt, n)


def test_eos_stops_generation(models):
    (model, v), _ = models
    prompt = [3, 1, 4, 1, 5]
    ref = _pure_greedy(model, v, SPEC, prompt, 17)
    eos = ref[6]  # force a stop partway
    sd = SpeculativeDecoder(model, v, SPEC, model, v, SPEC, k=4,
                            eos_token=eos)
    toks, _ = sd.generate(prompt, max_new_tokens=17)
    assert toks == ref[: ref.index(eos) + 1]
