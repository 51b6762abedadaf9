"""Sampling (greedy / temperature / top-k / top-p) + batcher integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.models.sampling import (
    GREEDY,
    SamplingParams,
    sample_tokens,
)


def _logits(rng, b=16, v=32):
    return jnp.asarray(rng.normal(size=(b, v)).astype(np.float32))


def test_greedy_is_argmax(rng):
    lg = _logits(rng)
    out = sample_tokens(lg, GREEDY)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.argmax(lg, -1)))


def test_greedy_needs_no_key_but_sampling_does(rng):
    lg = _logits(rng)
    sample_tokens(lg, GREEDY)  # fine without key
    with pytest.raises(ValueError):
        sample_tokens(lg, SamplingParams(temperature=1.0))


def test_sampling_deterministic_given_key(rng):
    lg = _logits(rng)
    p = SamplingParams(temperature=0.8, top_k=8, top_p=0.9)
    a = sample_tokens(lg, p, jax.random.key(3))
    b = sample_tokens(lg, p, jax.random.key(3))
    c = sample_tokens(lg, p, jax.random.key(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) != np.asarray(c)).any()


def test_top_k_restricts_support(rng):
    lg = _logits(rng, b=4)
    p = SamplingParams(temperature=5.0, top_k=3)  # hot: near-uniform over k
    allowed = np.asarray(jax.lax.top_k(lg, 3)[1])
    seen = set()
    for i in range(200):
        toks = np.asarray(sample_tokens(lg, p, jax.random.key(i)))
        for row, t in enumerate(toks):
            assert t in allowed[row]
            seen.add((row, int(t)))
    assert len(seen) > 4  # actually explores beyond argmax


def test_top_k_1_is_greedy(rng):
    lg = _logits(rng)
    p = SamplingParams(temperature=1.0, top_k=1)
    out = sample_tokens(lg, p, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.argmax(lg, -1)))


def test_top_p_tiny_is_greedy(rng):
    lg = _logits(rng)
    p = SamplingParams(temperature=1.0, top_p=1e-6)
    out = sample_tokens(lg, p, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.argmax(lg, -1)))


def test_top_p_mass_boundary():
    # probs ~ [0.5, 0.25, 0.125, ...]: top_p=0.7 keeps exactly {0, 1}
    logits = jnp.log(jnp.asarray([[0.5, 0.25, 0.125, 0.0625, 0.0625]]))
    p = SamplingParams(temperature=1.0, top_p=0.7)
    seen = {int(sample_tokens(logits, p, jax.random.key(i))[0])
            for i in range(200)}
    assert seen == {0, 1}


def test_batcher_sampling_integration(rng):
    """Sampled batcher: deterministic per seed, differs across seeds, and
    top_k=1 reproduces the greedy batcher exactly."""
    from fp8_quantization_tpu.config import (EstimatorConfig, FP8Config,
                                             QMethod, QuantConfig,
                                             RangeMethod, RunMethodConfig)
    from fp8_quantization_tpu.models.llama import (KVCache, LlamaSpec,
                                                   QuantizedLlama)
    from fp8_quantization_tpu.models.serving import ContinuousBatcher
    from fp8_quantization_tpu.quant import ESTIMATE

    qc = QuantConfig(
        method=QMethod.fp_quantizer, quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )
    spec = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                     num_kv_heads=2, mlp_dim=64, max_seq_len=32)
    model = QuantizedLlama(qc=qc, spec=spec)
    toks = jnp.asarray(rng.integers(0, 64, size=(2, 8)), jnp.int32)
    cache0 = KVCache.zeros(spec, 2, spec.max_seq_len)
    v = model.init(jax.random.key(0), toks, cache0, ESTIMATE)
    _, ups = model.apply(v, toks, cache0, ESTIMATE,
                         mutable=["quant", "quant_est"])
    v = {**v, **ups}

    def run(sampling, seed=0):
        b = ContinuousBatcher(model, v, spec, slots=2,
                              max_seq=spec.max_seq_len, sampling=sampling,
                              seed=seed)
        s0 = b.admit([3, 5, 7], max_new_tokens=6)
        s1 = b.admit([11, 13], max_new_tokens=6)
        b.run_to_completion()
        return [b.retire(s0), b.retire(s1)]

    hot = SamplingParams(temperature=1.5, top_k=8)
    a = run(hot, seed=1)
    b = run(hot, seed=1)
    c = run(hot, seed=2)
    assert a == b
    assert a != c
    assert run(SamplingParams(temperature=1.0, top_k=1)) == run(GREEDY)
