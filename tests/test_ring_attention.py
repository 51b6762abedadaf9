"""Ring attention vs full attention on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.parallel import make_mesh
from fp8_quantization_tpu.parallel.ring_attention import (
    full_attention,
    ring_attention,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _qkv(rng, b=2, s=64, h=4, h_kv=None, d=8):
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h_kv or h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h_kv or h, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(rng, causal):
    mesh = make_mesh(data=8, model=1)
    q, k, v = _qkv(rng)
    ref = full_attention(q, k, v, causal=causal)
    out = jax.jit(
        lambda q, k, v: ring_attention(q, k, v, mesh, causal=causal)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_gqa_heads(rng):
    """Grouped-query attention: 8 q heads over 2 kv heads."""
    mesh = make_mesh(data=8, model=1)
    q, k, v = _qkv(rng, h=8, h_kv=2)
    ref = full_attention(q, k, v, causal=True)
    out = ring_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_device_count_invariance(rng):
    """The result must not depend on how many devices share the sequence."""
    q, k, v = _qkv(rng, s=32)
    outs = []
    for n in (2, 4, 8):
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        outs.append(np.asarray(ring_attention(q, k, v, mesh, causal=True)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs[1], outs[2], rtol=2e-5, atol=2e-5)


def test_ring_rejects_bad_shapes(rng):
    mesh = make_mesh(data=8, model=1)
    q, k, v = _qkv(rng, s=60)  # 60 % 8 != 0
    with pytest.raises(ValueError):
        ring_attention(q, k, v, mesh)
    q, k, v = _qkv(rng, h=6, h_kv=4)
    with pytest.raises(ValueError):
        ring_attention(q, k, v, mesh)


def test_ring_long_context_row_sums(rng):
    """Causal rows are proper distributions: online softmax l equals the
    true normalizer (checked indirectly: uniform V gives exactly V)."""
    mesh = make_mesh(data=8, model=1)
    b, s, h, d = 1, 128, 2, 4
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.ones((b, s, h, d), jnp.float32) * 3.5
    out = ring_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)


def test_llama_ring_prefill_matches_dense(rng):
    """QuantizedLlama(ring_spec=...) prefill == the cache-gather prefill,
    including the KV cache it leaves behind (decode continues identically)."""
    import dataclasses

    from fp8_quantization_tpu.config import (
        EstimatorConfig,
        FP8Config,
        QMethod,
        QuantConfig,
        RangeMethod,
        RunMethodConfig,
    )
    from fp8_quantization_tpu.models.llama import (
        KVCache,
        LlamaSpec,
        QuantizedLlama,
    )
    from fp8_quantization_tpu.quant import ESTIMATE, FIXED

    qc = QuantConfig(
        method=QMethod.fp_quantizer, per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )
    spec = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                     num_kv_heads=2, mlp_dim=64, max_seq_len=32)
    mesh = make_mesh(data=8, model=1)

    base = QuantizedLlama(qc=qc, spec=spec)
    ringed = QuantizedLlama(qc=qc, spec=spec, ring_spec=(mesh, "data"))

    tokens = jnp.asarray(rng.integers(0, 64, size=(2, 16)), jnp.int32)
    cache0 = KVCache.zeros(spec, 2, spec.max_seq_len)
    variables = base.init(jax.random.key(0), tokens, cache0, ESTIMATE)
    _, ups = base.apply(variables, tokens, cache0, ESTIMATE,
                        mutable=["quant", "quant_est"])
    variables = {**variables, **ups}

    logits_d, cache_d = base.apply(variables, tokens, cache0, FIXED)
    logits_r, cache_r = ringed.apply(variables, tokens, cache0, FIXED)
    np.testing.assert_allclose(np.asarray(logits_r), np.asarray(logits_d),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(cache_r.k, np.float32), np.asarray(cache_d.k, np.float32))

    # decode one token from each cache with the plain model: identical path
    nxt = jnp.asarray(rng.integers(0, 64, size=(2, 1)), jnp.int32)
    ld, _ = base.apply(variables, nxt, cache_d, FIXED)
    lr, _ = base.apply(variables, nxt, cache_r, FIXED)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)
