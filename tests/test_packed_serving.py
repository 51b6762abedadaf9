"""Packed-FP8 (real 1-byte) weight storage + fused dequant-matmul tests.

The reference only simulates FP8 inside f32 tensors (SURVEY §0); this is the
storage path it has no analog for: ExMy codes packed to uint8, decoded in
VMEM inside the matmul kernel (ops/pallas/dequant_matmul.py).
"""

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
from fp8_quantization_tpu.numerics.codec import pack_exmy, unpack_exmy
from fp8_quantization_tpu.numerics.fp8_ste import quantize_to_fp8_ste
from fp8_quantization_tpu.ops.fastpath import (
    pack_dense_caches,
    strip_packed_params,
)
from fp8_quantization_tpu.ops.layers import QuantDense
from fp8_quantization_tpu.ops.pallas.dequant_matmul import (
    dequant_matmul,
    pack_weights,
    unpack_weights,
)
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.sites import FAST, PACKED, QuantPhase


def _ste_weights(rng, k, n, mant, with_tiny=True):
    w = rng.normal(size=(k, n)).astype(np.float32)
    if with_tiny:
        w[: k // 8] *= 1e-6  # force subnormal codes
    mv = np.max(np.abs(w), axis=0).reshape(1, -1)
    wq, bias = quantize_to_fp8_ste(jnp.asarray(w), 8, jnp.asarray(mv),
                                   float(mant), 1)
    return wq, jnp.broadcast_to(bias, (1, n))[0]


@pytest.mark.parametrize("expo,mant", [(3, 4), (4, 3), (2, 5), (5, 2)])
def test_codec_pack_roundtrip_on_value_space(expo, mant):
    """Every nominal-format code round-trips pack -> unpack bitwise."""
    bias = jnp.asarray([2 ** (expo - 1)], jnp.int32)
    codes = jnp.arange(256, dtype=jnp.int32)
    vals = unpack_exmy(codes.astype(jnp.uint8), expo, mant, bias)
    back = pack_exmy(vals, expo, mant, bias)
    # -0.0 (code 128) canonicalizes to +0.0 (code 0); all others exact
    expected = np.array(codes, np.int32)
    expected[1 << (expo + mant)] = 0
    np.testing.assert_array_equal(np.asarray(back, np.int32), expected)


@pytest.mark.parametrize("expo,mant", [(3, 4), (4, 3), (2, 5)])
def test_pack_weights_fidelity(expo, mant, rng):
    """Exact channels reproduce the STE grid bitwise; overflow channels move
    only by the bias-1 grid's subnormal half-ULP (bottom binades)."""
    wq, bias = _ste_weights(rng, 256, 64, mant)
    pw = pack_weights(wq, bias, expo, mant)
    dec = unpack_weights(pw)
    assert pw.codes.dtype == jnp.uint8
    exact_cols = np.asarray(jnp.all(dec == wq, axis=0))
    assert float(pw.exact_fraction) == pytest.approx(exact_cols.mean())
    assert exact_cols.any(), "expected some bit-exact channels"
    # non-exact channels: deviation bounded by one subnormal step of the
    # bias-1 grid, and only on magnitudes below its min_norm
    dev = np.abs(np.asarray(dec - wq, np.float64))
    bias_np = np.asarray(pw.bias, np.int64)
    step = 2.0 ** (1.0 - (bias_np + 1) - mant)  # packing used bias-1 there
    assert (dev <= step[None, :] + 1e-30).all()
    big = np.abs(np.asarray(wq, np.float64)) >= 2.0 ** (1 - bias_np)[None, :]
    assert (dev[big] == 0).all(), "normal-binade values must be exact"


@pytest.mark.parametrize("expo,mant", [(3, 4), (4, 3), (2, 5)])
def test_dequant_matmul_matches_golden(expo, mant, rng):
    wq, bias = _ste_weights(rng, 384, 256, mant)
    pw = pack_weights(wq, bias, expo, mant)
    dec = unpack_weights(pw, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(48, 384)), jnp.float32).astype(jnp.bfloat16)
    golden = jnp.dot(x, dec, preferred_element_type=jnp.float32)
    out = dequant_matmul(x, pw.codes, pw.bias, expo_width=expo,
                         mant_width=mant)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(golden))


def test_dequant_matmul_odd_shapes(rng):
    """Padding: shapes not multiples of the tile sizes."""
    wq, bias = _ste_weights(rng, 130, 70, 4)
    pw = pack_weights(wq, bias, 3, 4)
    x = jnp.asarray(rng.normal(size=(5, 130)), jnp.float32).astype(jnp.bfloat16)
    golden = jnp.dot(x, unpack_weights(pw, dtype=jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    out = dequant_matmul(x, pw.codes, pw.bias, expo_width=3, mant_width=4)
    # padding the K axis changes the f32 accumulation split points, so only
    # near-equality holds off tile boundaries (values identical per-term)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                               rtol=1e-5, atol=1e-5)


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


def _calibrated_dense(rng, in_f=32, out_f=48):
    layer = QuantDense(qc=_qc(), features=out_f)
    x = jnp.asarray(rng.normal(size=(8, in_f)), jnp.float32)
    v = layer.init(jax.random.key(0), x, ESTIMATE)
    _, ups = layer.apply(v, x, ESTIMATE, mutable=["quant", "quant_est"])
    v = {**v, **ups}
    cache_qp = QuantPhase(phase="fixed", cache_weights=True, fast=True)
    _, ups = layer.apply(v, x, cache_qp, mutable=["quant_cache"])
    return layer, {**v, **ups}, x


def test_quant_dense_packed_matches_fast(rng):
    layer, v, x = _calibrated_dense(rng)
    vp, report = pack_dense_caches(v, layer.qc)
    assert report, "expected the dense layer to be packed"
    out_fast = np.asarray(layer.apply(v, x, FAST), np.float32)
    out_packed = np.asarray(layer.apply(vp, x, PACKED), np.float32)
    # deviation only from overflow channels' bottom-subnormal requant
    np.testing.assert_allclose(out_packed, out_fast, rtol=2e-2, atol=2e-2)
    if all(f == 1.0 for f in report.values()):
        np.testing.assert_array_equal(out_packed, out_fast)


def test_packed_falls_through_without_codes(rng):
    """PACKED phase on un-packed variables == FAST (no codes installed)."""
    layer, v, x = _calibrated_dense(rng)
    out_fast = np.asarray(layer.apply(v, x, FAST), np.float32)
    out_packed = np.asarray(layer.apply(v, x, PACKED), np.float32)
    np.testing.assert_array_equal(out_packed, out_fast)


def test_strip_packed_params(rng):
    layer, v, x = _calibrated_dense(rng)
    vp, _ = pack_dense_caches(v, layer.qc)
    out_full = np.asarray(layer.apply(vp, x, PACKED), np.float32)
    vs = strip_packed_params(vp)
    assert "kernel" not in vs["params"]
    assert "w_q" not in vs["quant_cache"]
    assert vs["quant_cache"]["w_codes"].dtype == jnp.uint8
    out_stripped = np.asarray(layer.apply(vs, x, PACKED), np.float32)
    np.testing.assert_array_equal(out_stripped, out_full)


def test_llama_packed_decode_matches_fast(rng):
    from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama

    spec = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                     num_kv_heads=2, mlp_dim=64, max_seq_len=32)
    model = QuantizedLlama(qc=_qc(), spec=spec)
    toks = jnp.asarray(rng.integers(0, 64, size=(2, 8)), jnp.int32)
    cache0 = KVCache.zeros(spec, 2, spec.max_seq_len)
    v = model.init(jax.random.key(0), toks, cache0, ESTIMATE)
    _, ups = model.apply(v, toks, cache0, ESTIMATE,
                         mutable=["quant", "quant_est"])
    v = {**v, **ups}
    warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
    _, ups = model.apply(v, toks, cache0, warm, mutable=["quant_cache"])
    v = {**v, **ups}

    vp, report = pack_dense_caches(v, model.qc)
    assert len(report) == spec.num_layers * 7 + 1  # qkvo + 3 mlp + lm_head
    vp = strip_packed_params(vp)

    def greedy(variables, qp, steps=5):
        cache = KVCache.zeros(spec, 2, spec.max_seq_len)
        logits, cache = model.apply(variables, toks, cache, qp)
        out, last = [], jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        all_logits = [logits[:, -1]]
        for _ in range(steps):
            out.append(np.asarray(last))
            logits, cache = model.apply(variables, last, cache, qp)
            all_logits.append(logits[:, -1])
            last = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        return np.concatenate(out, 1), np.stack([np.asarray(l) for l in all_logits])

    toks_fast, logits_fast = greedy(v, FAST)
    toks_packed, logits_packed = greedy(vp, PACKED)
    # overflow channels' bottom-subnormal requant perturbs a few logits of
    # this tiny random model; greedy decoding must be unaffected
    np.testing.assert_allclose(logits_packed, logits_fast, rtol=0.3, atol=0.3)
    np.testing.assert_array_equal(toks_packed, toks_fast)


# --------------------------------------------------------------------------
# packed (uint8) KV cache
# --------------------------------------------------------------------------

def _llama_calibrated(rng, packed_kv=False):
    from fp8_quantization_tpu.models.llama import (KVCache, LlamaSpec,
                                                   QuantizedLlama)

    spec = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                     num_kv_heads=2, mlp_dim=64, max_seq_len=32)
    model = QuantizedLlama(qc=_qc(), spec=spec, packed_kv=packed_kv)
    toks = jnp.asarray(rng.integers(0, 64, size=(2, 8)), jnp.int32)
    dt = jnp.uint8 if packed_kv else jnp.bfloat16
    cache0 = KVCache.zeros(spec, 2, spec.max_seq_len, dtype=dt)
    v = model.init(jax.random.key(0), toks, cache0, ESTIMATE)
    _, ups = model.apply(v, toks, cache0, ESTIMATE,
                         mutable=["quant", "quant_est"])
    return model, spec, {**v, **ups}, toks


def test_packed_kv_cache_matches_bf16_cache(rng):
    """Same calibrated variables driven through the bf16-cache and the
    uint8-packed-cache model: tokens identical, logits close (the packed
    encode clamps onto the true-8-bit grid where the STE bias overflows)."""
    from fp8_quantization_tpu.models.llama import KVCache, QuantizedLlama

    model, spec, v, toks = _llama_calibrated(rng, packed_kv=False)
    pmodel = QuantizedLlama(qc=model.qc, spec=spec, packed_kv=True)

    def greedy(m, dtype, steps=5):
        cache = KVCache.zeros(spec, 2, spec.max_seq_len, dtype=dtype)
        logits, cache = m.apply(v, toks, cache, FAST)
        last = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        out, ls = [], [np.asarray(logits[:, -1])]
        for _ in range(steps):
            out.append(np.asarray(last))
            logits, cache = m.apply(v, last, cache, FAST)
            ls.append(np.asarray(logits[:, -1]))
            last = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        return np.concatenate(out, 1), np.stack(ls), cache

    t0, l0, _ = greedy(model, jnp.bfloat16)
    t1, l1, cache = greedy(pmodel, jnp.uint8)
    assert cache.k.dtype == jnp.uint8 and cache.v.dtype == jnp.uint8
    np.testing.assert_allclose(l1, l0, rtol=0.3, atol=0.3)
    np.testing.assert_array_equal(t1, t0)


def test_packed_kv_prefill_decode_consistency(rng):
    """Within the packed-KV model: incremental decode through the uint8
    cache reproduces the one-shot full-context forward."""
    from fp8_quantization_tpu.models.llama import KVCache, QuantizedLlama
    from fp8_quantization_tpu.quant import FIXED

    model, spec, v, _ = _llama_calibrated(rng, packed_kv=True)
    seq = jnp.asarray(rng.integers(0, 64, size=(1, 10)), jnp.int32)

    cache0 = KVCache.zeros(spec, 1, spec.max_seq_len, dtype=jnp.uint8)
    logits_full, _ = model.apply(v, seq, cache0, FIXED)

    cache = KVCache.zeros(spec, 1, spec.max_seq_len, dtype=jnp.uint8)
    logits_pre, cache = model.apply(v, seq[:, :6], cache, FIXED)
    np.testing.assert_allclose(np.asarray(logits_pre),
                               np.asarray(logits_full[:, :6]),
                               rtol=1e-4, atol=1e-4)
    for i in range(6, 10):
        logits_i, cache = model.apply(v, seq[:, i:i + 1], cache, FIXED)
        np.testing.assert_allclose(np.asarray(logits_i[:, 0]),
                                   np.asarray(logits_full[:, i]),
                                   rtol=1e-3, atol=1e-3)


def test_packed_kv_chunk_attention_matches_cache_path(rng):
    """The empty-cache prefill fast path must reproduce the packed cache
    readback bit-for-bit (store/load round trip)."""
    from fp8_quantization_tpu.models.llama import KVCache
    from fp8_quantization_tpu.quant import FIXED

    model, spec, v, _ = _llama_calibrated(rng, packed_kv=True)
    seq = jnp.asarray(rng.integers(0, 64, size=(2, 8)), jnp.int32)
    c0 = KVCache.zeros(spec, 2, spec.max_seq_len, dtype=jnp.uint8)
    la, ca = model.apply(v, seq, c0, FIXED)
    lb, cb = model.apply(v, seq, c0, FIXED, chunk_attention=True)
    np.testing.assert_array_equal(np.asarray(la, np.float32),
                                  np.asarray(lb, np.float32))
    np.testing.assert_array_equal(np.asarray(ca.k), np.asarray(cb.k))


def test_packed_kv_continuous_batcher(rng):
    """ContinuousBatcher on a packed-KV model: uint8 cache, same tokens as
    the bf16-cache batcher."""
    from fp8_quantization_tpu.models.llama import QuantizedLlama
    from fp8_quantization_tpu.models.serving import ContinuousBatcher

    model, spec, v, _ = _llama_calibrated(rng, packed_kv=False)
    pmodel = QuantizedLlama(qc=model.qc, spec=spec, packed_kv=True)
    prompts = [[3, 5, 7], [11, 13, 17, 19, 23]]

    def run(m):
        b = ContinuousBatcher(m, v, spec, slots=2, max_seq=spec.max_seq_len)
        slots = [b.admit(p, max_new_tokens=6) for p in prompts]
        b.run_to_completion()
        return [b.retire(s) for s in slots], b.cache

    toks0, c0 = run(model)
    toks1, c1 = run(pmodel)
    assert c0.k.dtype == jnp.bfloat16 and c1.k.dtype == jnp.uint8
    assert toks1 == toks0


def test_packed_kv_paged_matches_dense(rng):
    """uint8 paged pool == uint8 dense slab, token for token."""
    from fp8_quantization_tpu.models.llama import KVCache
    from fp8_quantization_tpu.models.paged_kv import PagedKVCache
    from fp8_quantization_tpu.quant import FIXED

    model, spec, v, _ = _llama_calibrated(rng, packed_kv=True)
    seq = jnp.asarray(rng.integers(0, 64, size=(1, 8)), jnp.int32)

    dense = KVCache.zeros(spec, 1, spec.max_seq_len, dtype=jnp.uint8)
    ld, dense = model.apply(v, seq, dense, FIXED)

    paged = PagedKVCache.zeros(spec, 1, num_pages=10, page_size=4,
                               dtype=jnp.uint8)
    # allocate pages 1..2 for the first 8 positions of slot 0
    paged = paged._replace(
        page_table=paged.page_table.at[0, :2].set(jnp.asarray([1, 2])))
    lp, paged = model.apply(v, seq, paged, FIXED)
    assert paged.k_pages.dtype == jnp.uint8
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lp),
                               rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# native int8 MXU path (uniform quantizers)
# --------------------------------------------------------------------------

def _qc_uniform(method=QMethod.symmetric_uniform, n_bits=8,
                res_quant=False):
    # res_quant off by default for tight comparisons: the int8 dot is MORE
    # exact than the simulated f32 dot, and any sub-ULP difference near a
    # res-requant rounding boundary amplifies to a full requant step
    return QuantConfig(
        method=method,
        n_bits=n_bits,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        run_method=RunMethodConfig(res_quantizer_flag=res_quant,
                                   original_quantize_res=res_quant),
    )


def _calibrated_uniform_dense(rng, method, n_bits=8, in_f=32, out_f=48,
                              shift_acts=0.0, res_quant=False):
    layer = QuantDense(qc=_qc_uniform(method, n_bits, res_quant),
                       features=out_f)
    x = jnp.asarray(rng.normal(size=(8, in_f)) + shift_acts, jnp.float32)
    v = layer.init(jax.random.key(0), x, ESTIMATE)
    _, ups = layer.apply(v, x, ESTIMATE, mutable=["quant", "quant_est"])
    v = {**v, **ups}
    cache_qp = QuantPhase(phase="fixed", cache_weights=True)
    _, ups = layer.apply(v, x, cache_qp, mutable=["quant_cache"])
    return layer, {**v, **ups}, x


@pytest.mark.parametrize("method,n_bits,shift", [
    (QMethod.symmetric_uniform, 8, 0.0),
    (QMethod.symmetric_uniform, 8, 5.0),   # unsigned detection
    (QMethod.symmetric_uniform, 4, 0.0),
    (QMethod.asymmetric_uniform, 8, 1.0),  # zero-point correction path
])
def test_int8_path_matches_simulation(method, n_bits, shift, rng):
    """The int8-MXU path reproduces the simulated uniform path. The integer
    dot accumulates exactly in int32, so only the simulation's f32 product
    rounding differs — near-equality with tight tolerance."""
    from fp8_quantization_tpu.quant.sites import FIXED

    layer, v, x = _calibrated_uniform_dense(rng, method, n_bits,
                                            shift_acts=shift)
    vp, report = pack_dense_caches(v, layer.qc)
    assert report and all(f == 1.0 for f in report.values()), report
    out_sim = np.asarray(layer.apply(v, x, FIXED), np.float32)
    out_i8 = np.asarray(layer.apply(vp, x, PACKED), np.float32)
    np.testing.assert_allclose(out_i8, out_sim, rtol=2e-5, atol=2e-5)


def test_int8_path_with_res_quantizer(rng):
    """With the res quantizer armed, the int8 and simulated paths may land
    on adjacent requant levels near rounding boundaries — differences are
    bounded by one res step and rare."""
    from fp8_quantization_tpu.quant.sites import FIXED

    layer, v, x = _calibrated_uniform_dense(
        rng, QMethod.symmetric_uniform, res_quant=True)
    vp, _ = pack_dense_caches(v, layer.qc)
    out_sim = np.asarray(layer.apply(v, x, FIXED), np.float32)
    out_i8 = np.asarray(layer.apply(vp, x, PACKED), np.float32)
    res_q = v["quant"]["res_quantizer"]["q"]
    step = float(np.maximum(np.asarray(res_q["delta"])[0], 1e-8))
    diff = np.abs(out_i8 - out_sim)
    assert diff.max() <= step * 1.001
    assert (diff > step * 0.5).mean() < 0.05  # boundary crossings are rare


def test_int8_strip_and_report(rng):
    layer, v, _ = _calibrated_uniform_dense(rng, QMethod.symmetric_uniform)
    vp, report = pack_dense_caches(v, layer.qc)
    assert vp["quant_cache"]["w_i8"].dtype == jnp.int8
    vs = strip_packed_params(vp)
    assert "kernel" not in vs["params"] and "w_q" not in vs["quant_cache"]
    x = jnp.asarray(np.zeros((2, 32)), jnp.float32)
    out = layer.apply(vs, x, PACKED)
    assert np.isfinite(np.asarray(out)).all()


def test_int8_exact_integer_accumulation(rng):
    """With scales forced to powers of two the int8 path is bit-exact vs a
    float oracle computed in f64."""
    from fp8_quantization_tpu.ops.fastpath import (Int8Weights,
                                                   quantize_acts_int8,
                                                   quantized_matmul_int8)

    k, n = 64, 32
    wi = rng.integers(-128, 128, size=(k, n)).astype(np.int8)
    xi = rng.integers(-128, 128, size=(8, k)).astype(np.int8)
    sw = np.full((n,), 2.0 ** -9, np.float32)
    sx = np.float32(2.0 ** -7)
    w = Int8Weights(codes=jnp.asarray(wi), scale=jnp.asarray(sw),
                    zp=jnp.full((n,), 128.0, jnp.float32),
                    wsum=jnp.asarray(wi.astype(np.int32).sum(0)))
    out = quantized_matmul_int8(jnp.asarray(xi), w, sx, jnp.float32(0.0))
    oracle = (xi.astype(np.float64) @ wi.astype(np.float64)) * (
        float(sx) * sw.astype(np.float64)[None, :])
    np.testing.assert_array_equal(np.asarray(out, np.float64), oracle)


def test_packed_sharded_batcher_matches_single_device(rng):
    """Packed weights + packed KV under a (data, model) mesh: the generic
    channel-last sharding rule covers the byte-code tensors (codes (K, N),
    pack bias / scales (N,)); tokens match the single-device run."""
    from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama
    from fp8_quantization_tpu.models.serving import ContinuousBatcher
    from fp8_quantization_tpu.parallel import make_mesh

    spec = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                     num_kv_heads=2, mlp_dim=64, max_seq_len=32)
    model = QuantizedLlama(qc=_qc(), spec=spec, packed_kv=True)
    toks = jnp.asarray(rng.integers(0, 64, size=(2, 8)), jnp.int32)
    cache0 = KVCache.zeros(spec, 2, spec.max_seq_len, dtype=jnp.uint8)
    v = model.init(jax.random.key(0), toks, cache0, ESTIMATE)
    _, ups = model.apply(v, toks, cache0, ESTIMATE,
                         mutable=["quant", "quant_est"])
    v = {**v, **ups}
    warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
    _, ups = model.apply(v, toks, cache0, warm, mutable=["quant_cache"])
    v = {**v, **ups}
    vp, _ = pack_dense_caches(v, model.qc)
    vp = strip_packed_params(vp)

    prompts = [[1, 2, 3], [7, 8, 9, 10]]

    def run(mesh):
        b = ContinuousBatcher(model, vp, spec, slots=2,
                              max_seq=spec.max_seq_len, qp=PACKED, mesh=mesh)
        slots = [b.admit(p, max_new_tokens=5) for p in prompts]
        b.run_to_completion()
        assert b.cache.k.dtype == jnp.uint8
        return [b.retire(s) for s in slots]

    want = run(None)
    got = run(make_mesh(data=2, model=2))
    assert got == want


def test_packed_variables_checkpoint_roundtrip(rng, tmp_path):
    """Packed byte-code variables (uint8/int8 leaves) survive an orbax
    checkpoint round trip bit-for-bit."""
    from fp8_quantization_tpu.utils import checkpoint as ckpt

    layer, v, x = _calibrated_dense(rng)
    vp, _ = pack_dense_caches(v, layer.qc)
    vp = strip_packed_params(vp)
    path = str(tmp_path / "packed_ckpt")
    ckpt.save_checkpoint(path, vp)
    restored = ckpt.load_checkpoint(path, template=vp)
    flat_a = jax.tree_util.tree_leaves_with_path(vp)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(restored))
    for key, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[key]))
    out_a = np.asarray(layer.apply(vp, x, PACKED))
    out_b = np.asarray(layer.apply(restored, x, PACKED))
    np.testing.assert_array_equal(out_a, out_b)


# --------------------------------------------------------------------------
# code-review regression tests
# --------------------------------------------------------------------------

def test_pack_skips_per_layer_nbits_override(rng):
    """quant_setup-style n_bits_w overrides: a 4-bit FP layer must NOT be
    packed with the global 8-bit format (its decode would use E=-1); it is
    skipped and keeps its kernel through strip_packed_params."""
    layer = QuantDense(qc=_qc(), features=16, n_bits_w=4)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    v = layer.init(jax.random.key(0), x, ESTIMATE)
    _, ups = layer.apply(v, x, ESTIMATE, mutable=["quant", "quant_est"])
    v = {**v, **ups}
    cache_qp = QuantPhase(phase="fixed", cache_weights=True, fast=True)
    _, ups = layer.apply(v, x, cache_qp, mutable=["quant_cache"])
    v = {**v, **ups}
    assert int(v["quant_cache"]["w_nbits"][0]) == 4
    vp, report = pack_dense_caches(v, layer.qc)
    assert report == {}  # E = 4-1-4 < 1: unpackable, skipped
    vs = strip_packed_params(vp)
    assert "kernel" in vs["params"]  # not stripped (no codes installed)
    out_fast = np.asarray(layer.apply(v, x, FAST), np.float32)
    out_packed_phase = np.asarray(layer.apply(vs, x, PACKED), np.float32)
    np.testing.assert_array_equal(out_packed_phase, out_fast)


def test_int8_unsigned_symmetric_weights(rng):
    """All-nonnegative kernels calibrate as UNSIGNED symmetric; their codes
    store with an effective -128 zero point whose correction must apply."""
    from fp8_quantization_tpu.quant.sites import FIXED

    layer = QuantDense(qc=_qc_uniform(QMethod.symmetric_uniform),
                       features=24)
    x = jnp.asarray(rng.normal(size=(6, 16)), jnp.float32)
    v = layer.init(jax.random.key(0), x, ESTIMATE)
    # force an all-nonnegative kernel before calibration
    v = dict(v)
    v["params"] = dict(v["params"], kernel=jnp.abs(v["params"]["kernel"]))
    _, ups = layer.apply(v, x, ESTIMATE, mutable=["quant", "quant_est"])
    v = {**v, **ups}
    assert int(v["quant"]["weight_quantizer"]["q"]["signed"][0]) == 0
    cache_qp = QuantPhase(phase="fixed", cache_weights=True)
    _, ups = layer.apply(v, x, cache_qp, mutable=["quant_cache"])
    v = {**v, **ups}
    vp, report = pack_dense_caches(v, layer.qc)
    assert all(f == 1.0 for f in report.values())
    out_sim = np.asarray(layer.apply(v, x, FIXED), np.float32)
    out_i8 = np.asarray(layer.apply(vp, x, PACKED), np.float32)
    np.testing.assert_allclose(out_i8, out_sim, rtol=2e-5, atol=2e-5)


def test_packed_kv_guards():
    from fp8_quantization_tpu.models.llama import KVCache, LlamaSpec, QuantizedLlama

    spec = LlamaSpec(vocab_size=16, hidden_size=16, num_layers=1, num_heads=2,
                     num_kv_heads=1, mlp_dim=16, max_seq_len=8)
    toks = jnp.zeros((1, 2), jnp.int32)
    cache = KVCache.zeros(spec, 1, 8, dtype=jnp.uint8)

    # uniform quantizer: clear error, not an obscure crash
    m = QuantizedLlama(qc=_qc_uniform(QMethod.symmetric_uniform), spec=spec,
                       packed_kv=True)
    with pytest.raises(ValueError, match="FP quantizer"):
        m.init(jax.random.key(0), toks, cache, ESTIMATE)

    # MSE estimator with mantissa-bit election: format not static
    qc = QuantConfig(
        method=QMethod.fp_quantizer, quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.MSE),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=True),
        run_method=RunMethodConfig(),
    )
    m = QuantizedLlama(qc=qc, spec=spec, packed_kv=True)
    with pytest.raises(ValueError, match="fixed mantissa"):
        m.init(jax.random.key(0), toks, cache, ESTIMATE)


# --------------------------------------------------------------------------
# INT4 nibble-packed weights
# --------------------------------------------------------------------------

def test_pack_int4_roundtrip(rng):
    from fp8_quantization_tpu.ops.fastpath import pack_int4, unpack_int4

    for kk in (64, 63, 1):
        codes = rng.integers(-8, 8, size=(kk, 24)).astype(np.int8)
        packed = pack_int4(jnp.asarray(codes))
        assert packed.dtype == jnp.uint8
        assert packed.shape == (-(-kk // 2), 24)
        back = unpack_int4(packed, kk)
        np.testing.assert_array_equal(np.asarray(back), codes)


def test_int4_matmul_kernel_matches_dot(rng):
    from fp8_quantization_tpu.ops.fastpath import pack_int4
    from fp8_quantization_tpu.ops.pallas.dequant_matmul import int4_matmul

    k, n, m = 96, 136, 9
    w = rng.integers(-8, 8, size=(k, n)).astype(np.int8)
    x = rng.integers(-128, 128, size=(m, k)).astype(np.int8)
    w4 = pack_int4(jnp.asarray(w))
    out = int4_matmul(jnp.asarray(x), w4, k=k)
    ref = x.astype(np.int64) @ w.astype(np.int64)
    np.testing.assert_array_equal(np.asarray(out, np.int64), ref)


def test_int4_layer_matches_simulation(rng):
    """4-bit uniform symmetric weights: nibble-packed path == simulation."""
    from fp8_quantization_tpu.quant.sites import FIXED

    layer, v, x = _calibrated_uniform_dense(rng, QMethod.symmetric_uniform,
                                            n_bits=4)
    vp, report = pack_dense_caches(v, layer.qc)
    assert "w_i4" in vp["quant_cache"] and "w_i8" not in vp["quant_cache"]
    kk = v["params"]["kernel"].shape[0]
    assert vp["quant_cache"]["w_i4"].shape[0] == -(-kk // 2)
    assert all(f == 1.0 for f in report.values()), report
    out_sim = np.asarray(layer.apply(v, x, FIXED), np.float32)
    out_i4 = np.asarray(layer.apply(vp, x, PACKED), np.float32)
    np.testing.assert_allclose(out_i4, out_sim, rtol=2e-5, atol=2e-5)
    # strip works for the int4 keys too
    vs = strip_packed_params(vp)
    assert "kernel" not in vs["params"] and "w_q" not in vs["quant_cache"]
    out_s = np.asarray(layer.apply(vs, x, PACKED), np.float32)
    np.testing.assert_array_equal(out_s, out_i4)
