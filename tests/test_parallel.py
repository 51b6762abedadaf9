"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import contextlib

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
from fp8_quantization_tpu.eval import MetricState, update_metrics
from fp8_quantization_tpu.models.demo import QuantizedDemoModel
from fp8_quantization_tpu.parallel import make_mesh, shard_batch, shard_variables
from fp8_quantization_tpu.quant import ESTIMATE, FIXED

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


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


def test_sharded_calibration_matches_single_device(rng):
    """Calibration over a (2, 4) mesh must produce the same ranges and eval
    outputs as single-device execution (global reductions via GSPMD)."""
    model = QuantizedDemoModel(qc=_qc(), features=16)
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)

    # single-device reference
    _, ups_ref = model.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    y_ref = model.apply({**variables, **ups_ref}, x, FIXED)

    mesh = make_mesh(data=2, model=4)
    with mesh:
        sharded_vars = shard_variables(variables, mesh)
        xs = shard_batch(x, mesh)

        @jax.jit
        def calib(v, x):
            _, ups = model.apply(v, x, ESTIMATE, mutable=["quant", "quant_est"])
            return ups

        ups = calib(sharded_vars, xs)
        merged = {**sharded_vars, **ups}

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x, FIXED)

        y = fwd(merged, xs)

    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ups["quant"]["fc"]["weight_quantizer"]["q"]["maxval"]),
        np.asarray(ups_ref["quant"]["fc"]["weight_quantizer"]["q"]["maxval"]),
        rtol=1e-6,
    )


def test_sharded_metrics_match(rng):
    logits = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 32, size=(8,)))
    ref = update_metrics(MetricState.zero(), logits, labels)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        ls = shard_batch(logits, mesh)
        ys = shard_batch(labels, mesh)

        @jax.jit
        def step(l, y):
            return update_metrics(MetricState.zero(), l, y)

        out = step(ls, ys)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


# ---------------------------------------------------------------------------
# Tensor-parallel packed kernels (parallel.shard_kernels, VERDICT r3 next #5)
# ---------------------------------------------------------------------------

def _calibrated_dense(rng, qc, k=16, n=16, n_bits_w=None):
    from fp8_quantization_tpu.ops.layers import QuantDense
    from fp8_quantization_tpu.quant.sites import QuantPhase

    layer = QuantDense(qc=qc, features=n, n_bits_w=n_bits_w)
    x = jnp.asarray(rng.normal(size=(8, k)).astype(np.float32))
    v = layer.init(jax.random.key(0), x, ESTIMATE)
    _, ups = layer.apply(v, x, ESTIMATE, mutable=["quant", "quant_est"])
    v = {**v, **ups}
    warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
    _, ups = layer.apply(v, x, warm, mutable=["quant_cache"])
    return layer, {**v, **ups}, x


def test_partitioned_dequant_matmul_matches_single_device(rng):
    """Packed-FP8 dense under partitioned_kernels(mesh): each chip runs the
    dequant kernel on its (K, N/model) code shard; tokens must match the
    single-device kernel bit-for-bit (full-K dots per shard, same math)."""
    from fp8_quantization_tpu.ops.fastpath import (
        pack_dense_caches, strip_packed_params)
    from fp8_quantization_tpu.parallel import partitioned_kernels
    from fp8_quantization_tpu.quant.sites import CHAINED, PACKED

    layer, v, x = _calibrated_dense(rng, _qc())
    vp, _ = pack_dense_caches(v, layer.qc)
    vp = strip_packed_params(vp)

    ref = np.asarray(layer.apply(vp, x, PACKED), np.float32)

    mesh = make_mesh(data=2, model=4)
    with mesh, partitioned_kernels(mesh):
        vs = shard_variables(vp, mesh)
        xs = shard_batch(x, mesh)

        @jax.jit
        def fwd(v, x):
            return layer.apply(v, x, PACKED)

        out = np.asarray(fwd(vs, xs), np.float32)
    np.testing.assert_array_equal(out, ref)

    # chained FP8: the uint8 x codes cross into the sharded kernel too
    from fp8_quantization_tpu.quant.sites import decoded

    ref_c = np.asarray(decoded(layer.apply(vp, x, CHAINED)), np.float32)
    with mesh, partitioned_kernels(mesh):
        @jax.jit
        def fwd_c(v, x):
            return decoded(layer.apply(v, x, CHAINED))

        out_c = np.asarray(fwd_c(shard_variables(vp, mesh),
                                 shard_batch(x, mesh)), np.float32)
    np.testing.assert_array_equal(out_c, ref_c)


def _qc_uniform(n_bits=8):
    return QuantConfig(
        method=QMethod.symmetric_uniform,
        n_bits=n_bits,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        run_method=RunMethodConfig(res_quantizer_flag=True),
    )


def test_partitioned_int4_matmul_matches_single_device(rng):
    """int4 nibble-packed dense under partitioned_kernels(mesh): sharded
    int4 kernel == single-device (exact int32 accumulation either way)."""
    from fp8_quantization_tpu.ops.fastpath import (
        pack_dense_caches, strip_packed_params)
    from fp8_quantization_tpu.parallel import partitioned_kernels
    from fp8_quantization_tpu.quant.sites import PACKED

    layer, v, x = _calibrated_dense(rng, _qc_uniform(), n_bits_w=4)
    vp, _ = pack_dense_caches(v, layer.qc)
    assert "w_i4" in str(jax.tree_util.tree_structure(vp))  # int4 installed
    vp = strip_packed_params(vp)

    ref = np.asarray(layer.apply(vp, x, PACKED), np.float32)

    mesh = make_mesh(data=2, model=4)
    with mesh, partitioned_kernels(mesh):
        vs = shard_variables(vp, mesh)
        xs = shard_batch(x, mesh)

        @jax.jit
        def fwd(v, x):
            return layer.apply(v, x, PACKED)

        out = np.asarray(fwd(vs, xs), np.float32)
    np.testing.assert_array_equal(out, ref)


def test_partitioned_kernel_hlo_has_no_code_gather(rng):
    """The compiled SPMD module under partitioned_kernels must not
    all-gather the uint8 weight codes (the r3 failure mode: GSPMD gathered
    + replicated the custom call per chip)."""
    from fp8_quantization_tpu.ops.fastpath import (
        pack_dense_caches, strip_packed_params)
    from fp8_quantization_tpu.parallel import partitioned_kernels
    from fp8_quantization_tpu.quant.sites import PACKED

    layer, v, x = _calibrated_dense(rng, _qc())
    vp, _ = pack_dense_caches(v, layer.qc)
    vp = strip_packed_params(vp)

    mesh = make_mesh(data=2, model=4)
    with mesh, partitioned_kernels(mesh):
        vs = shard_variables(vp, mesh)
        xs = shard_batch(x, mesh)

        hlo = (jax.jit(lambda v, x: layer.apply(v, x, PACKED))
               .lower(vs, xs).compile().as_text())
    gathers = [ln for ln in hlo.splitlines()
               if "all-gather" in ln and "u8[" in ln]
    assert not gathers, gathers[:3]


# ---------------------------------------------------------------------------
# Serving features under a mesh (VERDICT r3 weak #8): speculative decoding
# and prefix-cached admission must produce identical tokens sharded vs not
# ---------------------------------------------------------------------------

_LSPEC = None


def _llama_parts(rng, init_key: int = 0):
    from fp8_quantization_tpu.models.llama import (
        KVCache, LlamaSpec, QuantizedLlama)

    spec = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                     num_kv_heads=2, mlp_dim=64, max_seq_len=64)
    model = QuantizedLlama(qc=_qc(), spec=spec)
    toks = jnp.asarray(rng.integers(0, spec.vocab_size, size=(1, 10)),
                       jnp.int32)
    cache = KVCache.zeros(spec, 1, spec.max_seq_len)
    v = model.init(jax.random.key(init_key), toks, cache, ESTIMATE)
    _, ups = model.apply(v, toks, cache, ESTIMATE,
                         mutable=["quant", "quant_est"])
    return spec, model, {**v, **ups}


def test_sharded_speculative_decode_matches_single_device(rng):
    """Speculative decoding with model-sharded target/draft variables under a
    mesh must emit the exact single-device token sequence (greedy mode is
    token-identical to the target's greedy decode by construction, so any
    sharding-induced divergence surfaces as a token mismatch)."""
    from fp8_quantization_tpu.models.speculative import SpeculativeDecoder

    spec, model, v = _llama_parts(rng)
    prompt = [3, 1, 4, 1, 5]

    def run(mesh):
        if mesh is None:
            dec = SpeculativeDecoder(model, v, spec, model, v, spec, k=3)
            return dec.generate(prompt, max_new_tokens=8)[0]
        with mesh:
            # the mesh kwarg shards both variable trees and traces every
            # step under partitioned_kernels (packed drafts TP-partition)
            dec = SpeculativeDecoder(model, v, spec, model, v, spec, k=3,
                                     mesh=mesh)
            return dec.generate(prompt, max_new_tokens=8)[0]

    want = run(None)
    got = run(make_mesh(data=1, model=8))
    assert got == want


def test_sharded_prefix_admission_matches_cold(rng):
    """Prefix-cache splicing (host slab -> sharded device cache via
    dynamic_update_slice under GSPMD) must not change tokens: warm sharded
    admissions == cold single-device run, and the cache must actually hit."""
    from fp8_quantization_tpu.models.prefix_cache import PrefixCache
    from fp8_quantization_tpu.models.serving import ContinuousBatcher

    spec, model, v = _llama_parts(rng)
    shared = list(rng.integers(0, 64, size=20))
    prompts = [shared + [11, 12, 13], shared + [31, 32]]

    def run(mesh, pc):
        b = ContinuousBatcher(model, v, spec, slots=2,
                              max_seq=spec.max_seq_len, mesh=mesh,
                              prefix_cache=pc)
        out = []
        for p in prompts:
            s = b.admit(p, max_new_tokens=6)
            b.run_to_completion()
            out.append(b.retire(s))
        return out

    cold = run(None, None)
    pc = PrefixCache(max_tokens=256, bucket=16)
    warm = run(make_mesh(data=2, model=4), pc)
    assert warm == cold
    assert pc.misses == 1 and pc.hits == 1


def test_sharded_stochastic_speculative_matches_single_device(rng):
    """Stochastic speculative decoding (temperature/top-k accept-reject,
    spec_accept residual resampling) under a model-sharded mesh must emit the
    exact single-device token sequence: the PRNG key schedule is host-side
    and deterministic, so any divergence is a sharding bug in the filtered
    distributions or the cache rollback.

    The draft is a DIFFERENTLY-initialized model (init key 1), so its
    filtered distributions genuinely diverge from the target's and the
    rejection / residual-resampling / rollback branches execute under the
    mesh — a self-draft would accept every proposal (min(1, p/q) == 1,
    test_speculative_sampling.py::test_self_draft_accepts_everything) and
    leave the reject path untested (ADVICE r4 #1). The stats assertion
    proves rejections actually happened in both runs."""
    from fp8_quantization_tpu.models.sampling import SamplingParams
    from fp8_quantization_tpu.models.speculative import SpeculativeDecoder

    spec, model, v = _llama_parts(rng)
    _, _, dv = _llama_parts(rng, init_key=1)
    prompt = [3, 1, 4, 1, 5]
    sp = SamplingParams(temperature=0.8, top_k=16)

    def run(mesh):
        kw = {} if mesh is None else {"mesh": mesh}
        ctx = contextlib.nullcontext() if mesh is None else mesh
        with ctx:
            dec = SpeculativeDecoder(model, v, spec, model, dv, spec, k=3,
                                     sampling=sp, seed=7, **kw)
            toks, stats = dec.generate(prompt, max_new_tokens=8)
            # the reject/resample path must actually run for this test to
            # pin anything about it
            assert stats.accepted < stats.proposed, stats
            return toks

    want = run(None)
    got = run(make_mesh(data=1, model=8))
    assert got == want


def test_sharded_prefix_admission_packed_kv(rng):
    """Warm prefix admission with a PACKED (uint8-code) KV cache under a
    mesh: the byte slabs splice through the sharded dynamic_update_slice
    path unchanged, and tokens match the cold single-device run."""
    from fp8_quantization_tpu.models.llama import (
        KVCache, LlamaSpec, QuantizedLlama)
    from fp8_quantization_tpu.models.prefix_cache import PrefixCache
    from fp8_quantization_tpu.models.serving import ContinuousBatcher

    spec = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                     num_kv_heads=2, mlp_dim=64, max_seq_len=64)
    model = QuantizedLlama(qc=_qc(), spec=spec, packed_kv=True)
    toks = jnp.asarray(rng.integers(0, 64, size=(1, 10)), jnp.int32)
    cache = KVCache.zeros(spec, 1, spec.max_seq_len, dtype=jnp.uint8)
    v = model.init(jax.random.key(0), toks, cache, ESTIMATE)
    _, ups = model.apply(v, toks, cache, ESTIMATE,
                         mutable=["quant", "quant_est"])
    v = {**v, **ups}

    shared = list(rng.integers(0, 64, size=16))
    prompts = [shared + [1, 2], shared + [3]]

    def run(mesh, pc):
        b = ContinuousBatcher(model, v, spec, slots=2,
                              max_seq=spec.max_seq_len, mesh=mesh,
                              prefix_cache=pc)
        out = []
        for p in prompts:
            s = b.admit(p, max_new_tokens=5)
            b.run_to_completion()
            out.append(b.retire(s))
        return out

    cold = run(None, None)
    pc = PrefixCache(max_tokens=256, bucket=16)
    warm = run(make_mesh(data=2, model=4), pc)
    assert warm == cold
    assert pc.misses == 1 and pc.hits == 1


def test_sharded_chained_cnn_matches_single_device(rng):
    """The fused-boundary (Affine) CNN serving mode under a (2, 4) mesh must
    match single-device execution — the pending-affine folds are elementwise
    and must partition cleanly under GSPMD."""
    from fp8_quantization_tpu.eval import cache_quantized_weights
    from fp8_quantization_tpu.models.mobilenet_v2 import QuantizedMobileNetV2
    from fp8_quantization_tpu.ops.fastpath import (
        pack_dense_caches, strip_packed_params)
    from fp8_quantization_tpu.quant.sites import CHAINED

    qc = _qc_uniform()
    model = QuantizedMobileNetV2(qc=qc, num_classes=16, input_size=32,
                                 width_mult=0.25)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    v = model.init(jax.random.key(0), x[:1], ESTIMATE)
    _, ups = model.apply(v, x[:2], ESTIMATE, mutable=["quant", "quant_est"])
    v = {**v, **ups}
    v = cache_quantized_weights(model, v, x[:2], fast=True)
    vp, _ = pack_dense_caches(v, qc)
    vp = strip_packed_params(vp)

    ref = np.asarray(model.apply(vp, x, CHAINED))

    mesh = make_mesh(data=2, model=4)
    with mesh:
        vs = shard_variables(vp, mesh)
        xs = shard_batch(x, mesh)

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x, CHAINED)

        out = np.asarray(fwd(vs, xs))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sharded_speculative_batcher_matches_single_device(rng):
    """The speculative CONTINUOUS BATCHER (draft scan + batched verify +
    per-slot rollback, VERDICT r4 next #3) under a (data, model) mesh must
    emit the exact single-device tokens for every slot, with rejections
    actually occurring (different-init draft)."""
    from fp8_quantization_tpu.models.serving import ContinuousBatcher

    spec, model, v = _llama_parts(rng)
    _, _, dv = _llama_parts(rng, init_key=1)
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6]]

    def run(mesh):
        b = ContinuousBatcher(model, v, spec, slots=2, mesh=mesh,
                              draft_model=model, draft_variables=dv,
                              draft_spec=spec, spec_k=3)
        slots = [b.admit(p, max_new_tokens=7) for p in prompts]
        b.run_to_completion()
        assert b.accepted < b.proposed  # reject/rollback path must run
        return [b.retire(s) for s in slots]

    want = run(None)
    got = run(make_mesh(data=2, model=4))
    assert got == want


def test_sharded_paged_speculative_prefix_matches_single_device(rng):
    """The full paged serving composition under a (2, 4) mesh: paged target
    pool (KV heads sharded over model, pool shared over data) + batched
    speculative rounds + warm prefix admissions must emit the exact
    single-device tokens, with the cache hitting in both runs."""
    from fp8_quantization_tpu.models.paged_kv import PagedBatcher
    from fp8_quantization_tpu.models.prefix_cache import PrefixCache

    spec, model, v = _llama_parts(rng)
    _, dmodel, dv = _llama_parts(rng, init_key=1)
    shared = list(rng.integers(0, 64, size=20))
    prompts = [shared + [11, 12, 13], shared + [31, 32]]

    def run(mesh, pc):
        b = PagedBatcher(model, v, spec, slots=2, num_pages=48, page_size=8,
                         mesh=mesh, prefix_cache=pc, draft_model=dmodel,
                         draft_variables=dv, draft_spec=spec, spec_k=3)
        out = []
        for p in prompts:
            s = b.admit(p, max_new_tokens=6)
            b.run_to_completion()
            out.append(b.retire(s))
        return out

    cold = run(None, None)
    pc = PrefixCache(max_tokens=256, bucket=16)
    warm = run(make_mesh(data=2, model=4), pc)
    assert warm == cold
    assert pc.misses == 1 and pc.hits == 1
