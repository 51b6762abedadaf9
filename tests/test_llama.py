"""Quantized Llama decoder + FP8 KV-cache + continuous batching tests."""

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
from fp8_quantization_tpu.models.llama import (
    KVCache,
    LlamaSpec,
    QuantizedLlama,
)
from fp8_quantization_tpu.models.serving import ContinuousBatcher
from fp8_quantization_tpu.quant import ESTIMATE, FIXED

SPEC = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                 num_kv_heads=2, mlp_dim=64, max_seq_len=48)


def _qc():
    return QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )


@pytest.fixture(scope="module")
def calibrated():
    rng = np.random.default_rng(10)
    model = QuantizedLlama(qc=_qc(), spec=SPEC)
    tokens = jnp.asarray(rng.integers(0, SPEC.vocab_size, size=(2, 12)),
                         jnp.int32)
    cache = KVCache.zeros(SPEC, 2, SPEC.max_seq_len)
    variables = model.init(jax.random.key(0), tokens, cache, ESTIMATE)
    _, ups = model.apply(variables, tokens, cache, ESTIMATE,
                         mutable=["quant", "quant_est"])
    return model, {**variables, **ups}


def test_prefill_then_decode_matches_full_forward(calibrated, rng):
    """Incremental decode through the FP8 KV-cache must reproduce the
    full-context forward (cache correctness)."""
    model, variables = calibrated
    seq = jnp.asarray(rng.integers(0, SPEC.vocab_size, size=(1, 10)), jnp.int32)

    # full forward in one shot
    cache0 = KVCache.zeros(SPEC, 1, SPEC.max_seq_len)
    logits_full, _ = model.apply(variables, seq, cache0, FIXED)

    # prefill 6 tokens, then decode the remaining 4 one at a time
    cache = KVCache.zeros(SPEC, 1, SPEC.max_seq_len)
    logits_pre, cache = model.apply(variables, seq[:, :6], cache, FIXED)
    np.testing.assert_allclose(np.asarray(logits_pre),
                               np.asarray(logits_full[:, :6]),
                               rtol=1e-4, atol=1e-4)
    for i in range(6, 10):
        logits_i, cache = model.apply(variables, seq[:, i:i + 1], cache, FIXED)
        np.testing.assert_allclose(np.asarray(logits_i[:, 0]),
                                   np.asarray(logits_full[:, i]),
                                   rtol=1e-3, atol=1e-3)
    assert int(cache.length[0]) == 10


def test_kv_cache_is_fp8_grid_bf16(calibrated, rng):
    model, variables = calibrated
    seq = jnp.asarray(rng.integers(0, SPEC.vocab_size, size=(1, 8)), jnp.int32)
    cache = KVCache.zeros(SPEC, 1, SPEC.max_seq_len)
    _, cache = model.apply(variables, seq, cache, FIXED)
    assert cache.k.dtype == jnp.bfloat16 and cache.v.dtype == jnp.bfloat16
    # cached values lie on an FP8 grid: requantizing through the calibrated
    # site params is a no-op
    kq = variables["quant"]["layer_0"]["k_cache_quantizer"]["q"]
    from fp8_quantization_tpu.numerics import quantize_to_fp8_ste

    vals = cache.k[0, 0, :8].astype(jnp.float32)
    requant, _ = quantize_to_fp8_ste(vals, 8, kq["maxval"],
                                     kq["mantissa_bits"], 1)
    np.testing.assert_array_equal(np.asarray(requant), np.asarray(vals))


def test_continuous_batcher(calibrated, rng):
    model, variables = calibrated
    batcher = ContinuousBatcher(model, variables, SPEC, slots=3)

    s0 = batcher.admit([1, 2, 3, 4, 5], max_new_tokens=6)
    s1 = batcher.admit([7, 8, 9], max_new_tokens=4)
    assert {s0, s1} == {0, 1} and batcher.free == [2]

    batcher.run_to_completion()
    out0 = batcher.retire(s0)
    out1 = batcher.retire(s1)
    assert len(out0) == 6 and len(out1) == 4
    assert sorted(batcher.free) == [0, 1, 2]

    # batched generation must equal single-sequence generation (slot
    # interference would break this)
    solo = ContinuousBatcher(model, variables, SPEC, slots=1)
    t0 = solo.admit([1, 2, 3, 4, 5], max_new_tokens=6)
    solo.run_to_completion()
    assert solo.retire(t0) == out0

    # slot reuse after retirement
    s2 = batcher.admit([11, 12], max_new_tokens=3)
    batcher.run_to_completion()
    assert len(batcher.retire(s2)) == 3


def test_fused_sdpa_prefill_matches_einsum(calibrated, rng):
    """FORCE_FUSED routes serving prefill (fast mode, t > 1) through the
    Pallas SDPA kernel (interpret mode here): cold chunk prefill, cold slab
    prefill, and warm resume over the cache slab (per-batch ``offsets``)
    must all match the einsum path within the bf16-probability rounding the
    kernel introduces on the PV matmul."""
    from fp8_quantization_tpu.ops.pallas import attention
    from fp8_quantization_tpu.quant.sites import QuantPhase

    model, variables = calibrated
    seq = jnp.asarray(rng.integers(0, SPEC.vocab_size, size=(2, 12)),
                      jnp.int32)
    cache0 = KVCache.zeros(SPEC, 2, SPEC.max_seq_len)
    warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
    _, ups = model.apply(variables, seq, cache0, warm,
                         mutable=["quant_cache"])
    v = {**variables, **ups}
    fast = QuantPhase(phase="fixed", fast=True)

    def run(**kw):
        logits, cache = model.apply(v, seq, cache0, fast, **kw)
        # warm resume: 7-token prefix, then a 5-token chunk over the slab
        _, cache_a = model.apply(v, seq[:, :7], cache0, fast)
        logits_w, cache_w = model.apply(v, seq[:, 7:], cache_a, fast)
        return logits, cache, logits_w, cache_w

    le_c, cache_e, le_w, cache_ew = run()
    le_chunk, _, _, _ = run(chunk_attention=True)
    assert not attention.FORCE_FUSED
    attention.FORCE_FUSED = True
    try:
        lf_c, cache_f, lf_w, cache_fw = run()
        lf_chunk, _, _, _ = run(chunk_attention=True)
    finally:
        attention.FORCE_FUSED = False

    def close(a, b):
        # the kernel's bf16-probs rounding (~2^-8 relative on the context)
        # crosses FP8 act-grid boundaries downstream, so logits differ by
        # whole grid steps on a FEW elements — assert distribution-level
        # agreement + identical greedy tokens, not elementwise tolerance
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.sqrt(((a - b) ** 2).mean()) / b.std()
        assert rel < 0.1, rel
        np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))

    close(lf_c, le_c)
    close(lf_chunk, le_chunk)
    close(lf_w, le_w)
    # layer 0's KV cache is BIT-identical (its k/v are computed before any
    # attention; the kernel only changes the context computation, not the
    # cache stores — deeper layers see upstream grid-step drift)
    np.testing.assert_array_equal(np.asarray(cache_f.k[0]),
                                  np.asarray(cache_e.k[0]))
    np.testing.assert_array_equal(np.asarray(cache_fw.v[0]),
                                  np.asarray(cache_ew.v[0]))


def test_chunk_attention_prefill_matches_cache_path(calibrated, rng):
    """Empty-cache prefill with chunk_attention must be value-identical to
    the masked full-cache attention (and leave the same cache behind)."""
    model, variables = calibrated
    seq = jnp.asarray(rng.integers(0, SPEC.vocab_size, size=(2, 9)), jnp.int32)

    cache0 = KVCache.zeros(SPEC, 2, SPEC.max_seq_len)
    logits_a, cache_a = model.apply(variables, seq, cache0, FIXED)
    logits_b, cache_b = model.apply(variables, seq, cache0, FIXED,
                                    chunk_attention=True)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cache_a.k), np.asarray(cache_b.k))
    np.testing.assert_array_equal(np.asarray(cache_a.v), np.asarray(cache_b.v))


def test_continuous_batching_sharded_matches_single_device(calibrated):
    """Mesh-sharded continuous batching (slots over data, weights/KV heads
    over model) generates the same tokens as the single-device batcher —
    SURVEY §7 build order #8 ("continuous batching across hosts")."""
    from fp8_quantization_tpu.parallel import make_mesh

    model, variables = calibrated
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9], [13, 14], [20]]

    plain = ContinuousBatcher(model, variables, SPEC, slots=4)
    slots = [plain.admit(p, max_new_tokens=5) for p in prompts]
    plain.run_to_completion()
    want = [plain.retire(s) for s in slots]

    mesh = make_mesh(data=2, model=2)
    sharded = ContinuousBatcher(model, variables, SPEC, slots=4, mesh=mesh)
    slots = [sharded.admit(p, max_new_tokens=5) for p in prompts]
    sharded.run_to_completion()
    got = [sharded.retire(s) for s in slots]
    assert got == want

    with pytest.raises(ValueError):
        ContinuousBatcher(model, variables, SPEC, slots=3,
                          mesh=make_mesh(data=2, model=2))


def test_fp32_parity_vs_hf(rng):
    """Ported HF Llama weights must reproduce HF logits (validates RoPE /
    GQA / RMSNorm details)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import LlamaConfig, LlamaForCausalLM

    from fp8_quantization_tpu.models.porting import (
        merge_ported,
        port_llama,
        torch_state_to_numpy,
    )
    from fp8_quantization_tpu.quant import FP32

    torch.manual_seed(10)
    cfg = LlamaConfig(
        vocab_size=SPEC.vocab_size,
        hidden_size=SPEC.hidden_size,
        intermediate_size=SPEC.mlp_dim,
        num_hidden_layers=SPEC.num_layers,
        num_attention_heads=SPEC.num_heads,
        num_key_value_heads=SPEC.num_kv_heads,
        max_position_embeddings=SPEC.max_seq_len,
        rms_norm_eps=SPEC.rms_eps,
        rope_theta=SPEC.rope_theta,
        attention_bias=False,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    hf = LlamaForCausalLM(cfg)
    hf.eval()

    model = QuantizedLlama(qc=_qc(), spec=SPEC)
    ids = rng.integers(0, SPEC.vocab_size, size=(2, 9)).astype(np.int32)
    cache = KVCache.zeros(SPEC, 2, SPEC.max_seq_len)
    variables = model.init(jax.random.key(0), jnp.asarray(ids), cache, ESTIMATE)
    params, _ = port_llama(torch_state_to_numpy(hf.state_dict()),
                           num_layers=SPEC.num_layers)
    variables = merge_ported(variables, params, {})

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    ours, _ = model.apply(variables, jnp.asarray(ids), cache, FP32)
    # HF computes RoPE/attention in different op orders; logits are O(1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-2, atol=2e-3)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(ours), -1), np.argmax(ref, -1)
    )


def test_llama_sharded_cpu_mesh(calibrated, rng):
    """Decode step shards over (data, model) mesh and matches single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fp8_quantization_tpu.parallel import make_mesh, shard_batch, shard_variables

    model, variables = calibrated
    tokens = jnp.asarray(rng.integers(0, SPEC.vocab_size, size=(2, 4)),
                         jnp.int32)
    cache = KVCache.zeros(SPEC, 2, SPEC.max_seq_len)
    logits_ref, cache_ref = model.apply(variables, tokens, cache, FIXED)

    mesh = make_mesh(data=2, model=4)
    with mesh:
        vs = shard_variables(variables, mesh)
        ts = shard_batch(tokens, mesh)

        @jax.jit
        def step(v, t, c):
            return model.apply(v, t, c, FIXED)

        logits, cache2 = step(vs, ts, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cache2.length), np.asarray(cache_ref.length)
    )
