"""Stochastic speculative decoding: the accept/reject math must reproduce
ancestral sampling from the target distribution EXACTLY (not approximately —
the whole point of the Leviathan/Chen scheme), for any draft distribution."""

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
from fp8_quantization_tpu.models.sampling import (
    SamplingParams,
    filtered_probs,
    sample_tokens,
)
from fp8_quantization_tpu.models.speculative import (
    SpeculativeDecoder,
    spec_accept,
)
from fp8_quantization_tpu.quant import ESTIMATE


def _dists(rng, k, v):
    q = rng.dirichlet(np.ones(v), size=k).astype(np.float32)
    p = rng.dirichlet(np.ones(v), size=k + 1).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(p)


def _mc_outputs(q_rows, p_rows, k, n):
    """Run the full propose-from-q + spec_accept pipeline n times."""

    @jax.jit
    @jax.vmap
    def one(key):
        kq, ku, kr = jax.random.split(key, 3)
        drafts = jax.random.categorical(
            kq, jnp.log(q_rows), axis=-1).astype(jnp.int32)  # (k,)
        u = jax.random.uniform(ku, (k,))
        out, m = spec_accept(drafts, q_rows, p_rows, u, kr)
        return out, m

    return one(jax.random.split(jax.random.key(0), n))


def test_first_token_law_is_exactly_p():
    """Marginal of the first emitted token == p_rows[0], any q (MC check of
    the identity q*min(1,p/q) + (1-alpha)*norm((p-q)+) = p)."""
    rng = np.random.default_rng(0)
    k, v, n = 3, 5, 60000
    q_rows, p_rows = _dists(rng, k, v)
    out, _ = _mc_outputs(q_rows, p_rows, k, n)
    hist = np.bincount(np.asarray(out[:, 0]), minlength=v) / n
    np.testing.assert_allclose(hist, np.asarray(p_rows[0]), atol=0.012)


def test_second_token_law_conditioned_on_acceptance():
    """Given the first draft was accepted, the second emitted token's law is
    p_rows[1] (the scheme telescopes per position)."""
    rng = np.random.default_rng(1)
    k, v, n = 3, 5, 60000
    q_rows, p_rows = _dists(rng, k, v)
    out, m = _mc_outputs(q_rows, p_rows, k, n)
    out, m = np.asarray(out), np.asarray(m)
    sel = out[m >= 1, 1]
    hist = np.bincount(sel, minlength=v) / sel.size
    np.testing.assert_allclose(hist, np.asarray(p_rows[1]), atol=0.02)


def test_identical_distributions_always_accept():
    """p == q per position => acceptance ratio 1 => m == k always, and the
    bonus token is drawn from p_k."""
    rng = np.random.default_rng(2)
    k, v, n = 4, 7, 4000
    q_rows, _ = _dists(rng, k, v)
    p_rows = jnp.concatenate(
        [q_rows, jnp.asarray(rng.dirichlet(np.ones(v))[None], jnp.float32)])
    out, m = _mc_outputs(q_rows, p_rows, k, n)
    assert (np.asarray(m) == k).all()
    hist = np.bincount(np.asarray(out[:, k]), minlength=v) / n
    np.testing.assert_allclose(hist, np.asarray(p_rows[k]), atol=0.04)


def test_disjoint_supports_always_reject_and_resample_from_p():
    """q concentrated where p is zero => every draft rejected at position 0
    and the replacement comes from norm((p-q)+) = p restricted off q's
    support."""
    k, v, n = 2, 4, 20000
    q_rows = jnp.asarray([[1.0, 0, 0, 0]] * k, jnp.float32)
    p_rows = jnp.asarray([[0, 0.25, 0.25, 0.5]] * (k + 1), jnp.float32)
    out, m = _mc_outputs(q_rows, p_rows, k, n)
    assert (np.asarray(m) == 0).all()
    hist = np.bincount(np.asarray(out[:, 0]), minlength=v) / n
    np.testing.assert_allclose(hist, np.asarray(p_rows[0]), atol=0.02)


# --------------------------------------------------------------------------
# End-to-end on tiny quantized Llamas
# --------------------------------------------------------------------------

SPEC = LlamaSpec(vocab_size=32, hidden_size=32, num_layers=2, num_heads=4,
                 num_kv_heads=2, mlp_dim=64, max_seq_len=64)


def _qc():
    return QuantConfig(
        method=QMethod.fp_quantizer, quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )


@pytest.fixture(scope="module")
def calibrated():
    rng = np.random.default_rng(7)
    model = QuantizedLlama(qc=_qc(), spec=SPEC)
    toks = jnp.asarray(rng.integers(0, 32, size=(2, 12)), jnp.int32)
    cache = KVCache.zeros(SPEC, 2, SPEC.max_seq_len)
    v = model.init(jax.random.key(3), toks, cache, ESTIMATE)
    _, ups = model.apply(v, toks, cache, ESTIMATE,
                         mutable=["quant", "quant_est"])
    return model, {**v, **ups}


def test_self_draft_accepts_everything(calibrated):
    """Draft == target => p == q at every position => acceptance rate 1."""
    model, v = calibrated
    sd = SpeculativeDecoder(
        model, v, SPEC, model, v, SPEC, k=3,
        sampling=SamplingParams(temperature=0.9, top_k=8), seed=11)
    out, stats = sd.generate([5, 3, 1, 2], max_new_tokens=12)
    assert len(out) == 12
    assert stats.accepted == stats.proposed


def test_first_token_marginal_matches_target_sampling(calibrated):
    """The first generated token's empirical law over many runs matches
    direct sampling from the target's filtered distribution."""
    model, v = calibrated
    prompt = [5, 3, 1, 2]
    params = SamplingParams(temperature=1.0)

    # the exact target distribution after the prompt
    cache = KVCache.zeros(SPEC, 1, SPEC.max_seq_len)
    toks = jnp.zeros((1, 8), jnp.int32).at[0, :4].set(jnp.asarray(prompt))
    logits, _ = jax.jit(lambda v, t, c: model.apply(v, t, c))(v, toks, cache)
    p_true = np.asarray(filtered_probs(logits[0, 3], params))

    n = 300
    counts = np.zeros(SPEC.vocab_size)
    sd = SpeculativeDecoder(model, v, SPEC, model, v, SPEC, k=2,
                            sampling=params, seed=0)
    for i in range(n):
        sd._key = jax.random.key(1000 + i)
        sd._nkeys = 0
        out, _ = sd.generate(prompt, max_new_tokens=1)
        counts[out[0]] += 1
    hist = counts / n
    # coarse MC tolerance at n=300; catches wrong-distribution bugs (the
    # greedy path would put all mass on one token)
    assert np.abs(hist - p_true).max() < 0.09
    assert (hist[p_true < 1e-6] == 0).all()


def test_greedy_mode_unchanged(calibrated):
    """sampling=GREEDY keeps the exact greedy-equality property."""
    model, v = calibrated
    sd = SpeculativeDecoder(model, v, SPEC, model, v, SPEC, k=3)
    out, _ = sd.generate([1, 2, 3], max_new_tokens=8)

    # reference: plain greedy decode
    cache = KVCache.zeros(SPEC, 1, SPEC.max_seq_len)
    toks = jnp.zeros((1, 8), jnp.int32).at[0, :3].set(jnp.asarray([1, 2, 3]))
    step = jax.jit(lambda v, t, c: model.apply(v, t, c))
    logits, cache = step(v, toks, cache)
    cache = cache._replace(length=jnp.full_like(cache.length, 3))
    cur = int(jnp.argmax(logits[0, 2]))
    ref = [cur]
    for _ in range(7):
        logits, cache = step(v, jnp.asarray([[cur]], jnp.int32), cache)
        cur = int(jnp.argmax(logits[0, -1]))
        ref.append(cur)
    assert out == ref
