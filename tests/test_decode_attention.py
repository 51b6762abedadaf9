"""Decode-attention kernel (ops/pallas/decode_attention.py) vs the einsum
decode path: blockwise online softmax with length masking, GQA head
grouping, and in-kernel uint8 ExMy KV decode (VERDICT r2 next #7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.numerics.codec import (
    pack_exmy,
    unpack_consts,
    unpack_exmy_bits,
)
from fp8_quantization_tpu.ops.pallas.decode_attention import (
    decode_attention,
    decode_attention_fits_vmem,
)


def einsum_decode_reference(q, kf, vf, lengths):
    """The models/llama.py einsum decode (t=1) on f32 slabs."""
    b, h, d = q.shape
    hk = kf.shape[2]
    g = h // hk
    qg = q.reshape(b, 1, hk, g, d)
    scores = jnp.einsum("btkgd,bskd->btkgs", qg, kf) / jnp.sqrt(
        jnp.asarray(d, jnp.float32))
    s_max = kf.shape[1]
    key_pos = jnp.arange(s_max)[None, :]
    valid = key_pos < lengths[:, None]
    scores = jnp.where(valid[:, None, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("btkgs,bskd->btkgd", probs, vf)
    return ctx.reshape(b, h, d)


@pytest.mark.parametrize("s,bs", [(64, 64), (160, 64)])
def test_decode_attention_bf16_matches_einsum(rng, s, bs):
    b, h, hk, d = 3, 8, 4, 32
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(b, s, hk, d)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(b, s, hk, d)).astype(np.float32))
    lengths = jnp.asarray([1, s // 2, s], jnp.int32)

    ref = einsum_decode_reference(
        q, kf.astype(jnp.bfloat16).astype(jnp.float32),
        vf.astype(jnp.bfloat16).astype(jnp.float32), lengths)
    out = decode_attention(q, kf.astype(jnp.bfloat16),
                           vf.astype(jnp.bfloat16), lengths, bs=bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_decode_attention_coded_kv_matches_decoded_einsum(rng):
    """uint8 ExMy slabs decoded IN-KERNEL == XLA-decode-then-einsum."""
    b, s, h, hk, d = 2, 96, 8, 2, 32
    expo, mant = 3, 4
    kb, vb = jnp.int32(4), jnp.int32(5)
    kf = jnp.asarray(rng.normal(size=(b, s, hk, d)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(b, s, hk, d)).astype(np.float32))
    kcodes = pack_exmy(kf, expo, mant, kb, clip_of=True)
    vcodes = pack_exmy(vf, expo, mant, vb, clip_of=True)
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    lengths = jnp.asarray([s // 3, s], jnp.int32)

    keb, kss = unpack_consts(kb, mant)
    veb, vss = unpack_consts(vb, mant)
    kdec = unpack_exmy_bits(kcodes, expo, mant, keb, kss)
    vdec = unpack_exmy_bits(vcodes, expo, mant, veb, vss)
    ref = einsum_decode_reference(
        q, kdec.astype(jnp.bfloat16).astype(jnp.float32),
        vdec.astype(jnp.bfloat16).astype(jnp.float32), lengths)

    out = decode_attention(q, kcodes, vcodes, lengths, k_bias=kb, v_bias=vb,
                           kv_expo=expo, kv_mant=mant, bs=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_decode_attention_under_jit_and_grad_free(rng):
    b, s, h, hk, d = 2, 64, 4, 4, 16
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(b, s, hk, d)),
                     dtype=jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(b, s, hk, d)),
                     dtype=jnp.bfloat16)
    lengths = jnp.asarray([s, s // 4], jnp.int32)

    f = jax.jit(lambda q_, k_, v_, l_: decode_attention(q_, k_, v_, l_,
                                                        bs=64))
    out = f(q, kf, vf, lengths)
    assert out.shape == (b, h, d)
    ref = einsum_decode_reference(q, kf.astype(jnp.float32),
                                  vf.astype(jnp.float32), lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_vmem_estimate():
    assert decode_attention_fits_vmem(4096, 8, 128, 1)
    assert decode_attention_fits_vmem(8192, 8, 128, 2)
    assert not decode_attention_fits_vmem(8192, 64, 256, 2, bs=8192,
                                          limit_mb=10)


def test_llama_decode_kernel_matches_einsum(rng):
    """Llama decode with the kernel (fused_sdpa=True) == einsum decode
    (fused_sdpa=False), bf16 and packed-uint8 KV."""
    import jax

    from fp8_quantization_tpu.config import (
        EstimatorConfig, FP8Config, QMethod, QuantConfig, RangeMethod,
        RunMethodConfig)
    from fp8_quantization_tpu.models.llama import (
        KVCache, LlamaSpec, QuantizedLlama)
    from fp8_quantization_tpu.quant import ESTIMATE
    from fp8_quantization_tpu.quant.sites import QuantPhase

    qc = QuantConfig(
        method=QMethod.fp_quantizer, per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True))
    spec = LlamaSpec(vocab_size=64, hidden_size=32, num_layers=2,
                     num_heads=4, num_kv_heads=2, mlp_dim=64, max_seq_len=32)
    for packed_kv, dtype in [(False, jnp.bfloat16), (True, jnp.uint8)]:
        model = QuantizedLlama(qc=qc, spec=spec, packed_kv=packed_kv)
        toks = jnp.asarray(rng.integers(0, 64, size=(2, 8)), jnp.int32)
        cache0 = KVCache.zeros(spec, 2, 32, dtype=dtype)
        variables = model.init(jax.random.key(0), toks, cache0, ESTIMATE)
        _, ups = model.apply(variables, toks, cache0, ESTIMATE,
                             mutable=["quant", "quant_est"])
        variables = {**variables, **ups}

        # prefill with the einsum path, then one decode step both ways
        pre = QuantPhase(phase="fixed", fast=True, fused_sdpa=False)
        _, cache = model.apply(variables, toks, cache0, pre)
        tok = jnp.asarray(rng.integers(0, 64, size=(2, 1)), jnp.int32)
        l_ein, _ = model.apply(variables, tok, cache, pre)
        l_ker, _ = model.apply(
            variables, tok, cache,
            QuantPhase(phase="fixed", fast=True, fused_sdpa=True))
        # same contract as the fused prefill kernel (test_llama.py): the
        # kernel's bf16 q/probs rounding crosses FP8 act-grid boundaries
        # downstream -> distribution-level agreement + identical greedy
        # tokens, not elementwise tolerance
        a = np.asarray(l_ker, np.float32)
        bb = np.asarray(l_ein, np.float32)
        rel = np.sqrt(((a - bb) ** 2).mean()) / bb.std()
        assert rel < 0.1, (packed_kv, rel)
        np.testing.assert_array_equal(a.argmax(-1), bb.argmax(-1))
