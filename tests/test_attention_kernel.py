"""Fused SDPA Pallas kernel == the unfused einsum/softmax reference.

The kernel is token-major — (B, T, H, D) — so the reference math (head-
major einsums) transposes at the boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.ops.pallas.attention import fused_sdpa
from fp8_quantization_tpu.ops.pallas.fused_matmul import quantize_block


def _tok(x):
    return x.transpose(0, 2, 1, 3)  # (B,H,S,D) <-> (B,S,H,D)


def _sdpa(q, k, v, **kw):
    """Head-major wrapper over the token-major kernel."""
    return _tok(fused_sdpa(_tok(q), _tok(k), _tok(v), **kw))


def _reference(q, k, v, s_valid, causal):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.bfloat16),
                        k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    s = q.shape[2]
    key_pos = jnp.arange(k.shape[2])[None, None, None, :]
    mask = key_pos < s_valid
    if causal:
        mask = mask & (key_pos <= jnp.arange(s)[None, None, :, None])
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("s,d,s_valid,causal", [
    (197, 64, 197, False),     # ViT-B/16 shape (runs UNPADDED)
    (64, 64, 50, False),       # masked tail
    (128, 128, 128, True),     # causal decoder chunk
    (100, 32, 77, True),       # unaligned everything
])
def test_fused_sdpa_matches_reference(rng, s, d, s_valid, causal):
    b, h = 2, 3
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

    ref = np.asarray(_reference(q, k, v, s_valid, causal))
    out = np.asarray(_sdpa(q, k, v, s_valid=s_valid, causal=causal))
    np.testing.assert_allclose(out[:, :, :s_valid], ref[:, :, :s_valid],
                               rtol=2e-3, atol=2e-3)
    # q-blocked path (bq < S) must agree on the valid rows
    out_b = np.asarray(_sdpa(q, k, v, s_valid=s_valid, causal=causal,
                             bq=64))
    np.testing.assert_array_equal(out_b[:, :, :s_valid],
                                  out[:, :, :s_valid])


def test_fused_sdpa_gqa(rng):
    """GQA: q head h reads kv head h // groups inside the kernel — must
    equal the reference with kv heads repeated."""
    b, h, hk, s, d = 2, 6, 2, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    rep = lambda u: jnp.repeat(u, h // hk, axis=1)
    ref = np.asarray(_reference(q, rep(k), rep(v), s, True))
    out = np.asarray(_sdpa(q, k, v, causal=True))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_fused_sdpa_offsets_and_slab(rng):
    """Warm-prefill shape: T queries at per-batch positions offsets[b]+i
    attend to an S-key cache slab (S > T); the causal cap masks the slab's
    garbage tail. Reference: full masked einsum."""
    b, h, t, sk, d = 3, 2, 64, 192, 32
    offs = jnp.asarray([0, 37, 128], jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    # garbage (huge) values beyond each slab's valid region must be inert
    key_pos = jnp.arange(sk)
    garbage = (key_pos[None, :] >= (offs[:, None] + t))[:, None, :, None]
    k = jnp.where(garbage, 1e4, k)
    v = jnp.where(garbage, 1e4, v)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.bfloat16),
                        k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(d, jnp.float32))
    mask = (key_pos[None, None, :]
            <= offs[:, None, None] + jnp.arange(t)[None, :, None])
    scores = jnp.where(mask[:, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    ref = np.asarray(jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), preferred_element_type=jnp.float32))

    out = np.asarray(_sdpa(q, k, v, causal=True, offsets=offs))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
    # q-blocking must not change values
    out_b = np.asarray(_sdpa(q, k, v, causal=True, offsets=offs, bq=32))
    np.testing.assert_array_equal(out_b, out)


def test_fused_sdpa_requant_epilogue(rng):
    """res_params quantizes the context in-kernel == quantize_block after."""
    s, d = 64, 64
    q = jnp.asarray(rng.normal(size=(2, 2, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, s, d)).astype(np.float32))
    params = (jnp.float32(2.0), jnp.int32(5), jnp.int32(4), jnp.int32(1))

    plain = _sdpa(q, k, v)
    fused = _sdpa(q, k, v, res_params=params)
    expect = quantize_block(plain, *params)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expect),
                               rtol=1e-6, atol=1e-7)


def test_fused_sdpa_bf16_inputs(rng):
    """Serving modes feed bf16 (grid-exact) tensors."""
    s, d = 32, 64
    q = jnp.asarray(rng.normal(size=(2, 2, s, d)).astype(np.float32)).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 2, s, d)).astype(np.float32)).astype(
        jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 2, s, d)).astype(np.float32)).astype(
        jnp.bfloat16)
    ref = np.asarray(_reference(q, k, v, s, False))
    out = np.asarray(_sdpa(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
