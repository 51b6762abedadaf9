"""Paged KV cache tests: dense-vs-paged parity, scrambled page tables,
page allocator accounting, and PagedBatcher vs ContinuousBatcher equality."""

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
from fp8_quantization_tpu.models.paged_kv import (
    PageAllocator,
    PagedBatcher,
    PagedKVCache,
)
from fp8_quantization_tpu.models.serving import ContinuousBatcher
from fp8_quantization_tpu.quant import ESTIMATE, FIXED

PAGE = 8
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


def _paged_cache(batch, table_rows, num_pages=32):
    max_pages = SPEC.max_seq_len // PAGE
    cache = PagedKVCache.zeros(SPEC, batch, num_pages, PAGE, max_pages)
    table = np.zeros((batch, max_pages), np.int32)
    for b, row in enumerate(table_rows):
        table[b, :len(row)] = row
    return cache._replace(page_table=jnp.asarray(table))


@pytest.mark.parametrize("rows", [
    # contiguous physical pages
    [[1, 2, 3, 4, 5, 6], [7, 8, 9, 10, 11, 12]],
    # scrambled, interleaved physical pages
    [[17, 3, 25, 9, 30, 14], [2, 28, 6, 19, 11, 23]],
])
def test_paged_matches_dense(calibrated, rows):
    """Prefill + incremental decode through the paged cache must reproduce
    the dense KVCache logits, for contiguous and scrambled page tables."""
    model, variables = calibrated
    rng = np.random.default_rng(3)
    seq = jnp.asarray(rng.integers(0, SPEC.vocab_size, size=(2, 12)),
                      jnp.int32)

    dense = KVCache.zeros(SPEC, 2, SPEC.max_seq_len)
    paged = _paged_cache(2, rows)

    ld, dense = model.apply(variables, seq[:, :8], dense, FIXED)
    lp, paged = model.apply(variables, seq[:, :8], paged, FIXED)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)

    for i in range(8, 12):
        ld, dense = model.apply(variables, seq[:, i:i + 1], dense, FIXED)
        lp, paged = model.apply(variables, seq[:, i:i + 1], paged, FIXED)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                                   rtol=1e-5, atol=1e-5)
    assert int(paged.length[0]) == 12
    assert paged.page_size == PAGE


def test_paged_cache_values_live_in_pages(calibrated):
    """The written K values land in the mapped physical pages and are
    FP8-grid bf16; the trash page only sees junk from padding."""
    model, variables = calibrated
    rng = np.random.default_rng(4)
    seq = jnp.asarray(rng.integers(0, SPEC.vocab_size, size=(1, PAGE + 3)),
                      jnp.int32)
    paged = _paged_cache(1, [[5, 9]])
    _, paged = model.apply(variables, seq, paged, FIXED)
    k = np.asarray(paged.k_pages, np.float32)
    # page 5 holds positions [0, PAGE): fully written
    assert np.abs(k[0, 5]).sum() > 0
    # page 9 holds positions [PAGE, PAGE+3): first 3 rows written
    assert np.abs(k[0, 9, :3]).sum() > 0
    assert np.abs(k[0, 9, 3:]).sum() == 0
    # unmapped pages untouched
    assert np.abs(k[0, 10:]).sum() == 0
    assert paged.k_pages.dtype == jnp.bfloat16


def test_page_allocator():
    a = PageAllocator(8)
    assert a.num_free == 7  # page 0 reserved
    got = a.alloc(3)
    assert 0 not in got and len(set(got)) == 3
    assert a.num_free == 4
    a.release(got + [0])  # releasing the trash page is a no-op
    assert a.num_free == 7
    with pytest.raises(RuntimeError):
        a.alloc(8)


def test_paged_batcher_matches_dense_batcher(calibrated):
    """Same prompts through PagedBatcher and ContinuousBatcher generate the
    same tokens; pages are freed at retirement."""
    model, variables = calibrated
    prompts = [[3, 7, 11, 2], [30, 1, 9]]

    dense = ContinuousBatcher(model, variables, SPEC, slots=2,
                              max_seq=SPEC.max_seq_len)
    paged = PagedBatcher(model, variables, SPEC, slots=2, num_pages=16,
                         page_size=PAGE, max_seq=SPEC.max_seq_len)
    free0 = paged.allocator.num_free

    slots_d = [dense.admit(p, max_new_tokens=6) for p in prompts]
    slots_p = [paged.admit(p, max_new_tokens=6) for p in prompts]
    dense.run_to_completion()
    paged.run_to_completion()

    for sd, sp in zip(slots_d, slots_p):
        out_d = dense.retire(sd)
        out_p = paged.retire(sp)
        assert out_d == out_p, (out_d, out_p)
    assert paged.allocator.num_free == free0
    assert not paged.active and len(paged.free_slots) == 2


def test_paged_batcher_page_growth_and_reuse(calibrated):
    """Pages are allocated lazily as sequences cross page boundaries, and a
    retired slot's pages are reusable by the next admission."""
    model, variables = calibrated
    paged = PagedBatcher(model, variables, SPEC, slots=2, num_pages=8,
                         page_size=PAGE, max_seq=SPEC.max_seq_len)
    # prompt of 3 pads to 16 -> 2 pages at admit
    slot = paged.admit([1, 2, 3], max_new_tokens=PAGE * 2)
    assert paged.allocator.num_free == 7 - 2
    # decode past position 16 -> a third page appears
    paged.run_to_completion()
    # max_new tokens generated; the final one is never written back, so the
    # cache holds prompt + max_new - 1 positions
    assert int(paged.lengths[slot]) == 3 + PAGE * 2 - 1
    assert np.count_nonzero(paged.table[slot]) == 3
    paged.retire(slot)
    assert paged.allocator.num_free == 7
    # pool of 8 pages could never hold 2 dense slots of max_seq=48 (12 pages);
    # paged admission of two short prompts fits fine
    s1 = paged.admit([5, 6], max_new_tokens=2)
    s2 = paged.admit([7, 8, 9], max_new_tokens=2)
    paged.run_to_completion()
    assert len(paged.retire(s1)) == 2 and len(paged.retire(s2)) == 2
