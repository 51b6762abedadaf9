"""Quantized ViT-B/16 (HF ``google/vit-base-patch16-224`` architecture),
TPU-native (flax).

Re-design of `/root/reference/models/vit_quantized.py:19-402`: the reference
wraps HF torch modules in Quantized* shims; here the quantized transformer is
defined directly with the same quantization sites:

* patch-embedding conv (QuantConv) + site on the embedding tokens (:56-86)
* site after cls-token/pos-embed add (:88-116)
* per block: QuantLayerNorm (gamma as weight) -> q/k/v QuantDense ->
  *unquantized* scaled-dot-product attention (:188-196) -> site on the
  context -> output QuantDense -> residual add + site (:268-290) ->
  QuantLayerNorm -> intermediate QuantDense + GELU + site -> output
  QuantDense + residual add + site
* site after the encoder stack (:292-312), final QuantLayerNorm, classifier
  QuantDense on the CLS token (:388-393)

Weights load from HF torch checkpoints via ``porting.port_vit``.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax.numpy as jnp

from ..config import QMethod, QuantConfig
from ..ops.activations import ACTIVATIONS
from ..ops.layers import QuantConv, QuantDense, QuantLayerNorm
from ..quant.sites import (
    FIXED,
    QuantPhase,
    QuantSite,
    codes_eligible,
    decoded,
)


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224
    num_classes: int = 1000
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"


VIT_B_16 = ViTSpec()


class _ActSite(nn.Module):
    """A bare QuantizedActivation site (base_quantized_classes.py:189-206).

    In chained serving (``qp.chained``, uniform per-tensor quantizers) the
    site emits ``Coded`` int8 codes instead of fake-quantized f32 — the
    downstream dense consumes them directly and every elementwise consumer
    dequantizes inline (``decoded``), quartering inter-layer activation HBM
    traffic at identical values."""

    qc: QuantConfig

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        if qp.quant_a:
            x = QuantSite(self.qc.act_quantizer(), self.qc.act_range,
                          name="activation_quantizer")(
                x, qp, as_codes=codes_eligible(self.qc.act_quantizer(), qp))
        return x


class QuantViTSelfAttention(nn.Module):
    """q/k/v projections quantized; SDPA itself unquantized
    (vit_quantized.py:159-201)."""

    qc: QuantConfig
    spec: ViTSpec

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        s = self.spec
        head_dim = s.hidden_size // s.num_heads

        q = QuantDense(qc=self.qc, features=s.hidden_size, name="query")(x, qp)
        k = QuantDense(qc=self.qc, features=s.hidden_size, name="key")(x, qp)
        v = QuantDense(qc=self.qc, features=s.hidden_size, name="value")(x, qp)

        b, t, _ = x.shape

        from ..ops.pallas.attention import sdpa_fits_vmem

        # measured r3 (bench_artifacts/vit_modes.json): the fused SDPA
        # kernel LOSES ~20% end-to-end at ViT-B/16 batch-32 on the v5e
        # (sdpa_fused_speedup 0.794, interleaved) — XLA's fused einsum
        # chain wins at S=197 where scores fit small tiles. Default OFF for
        # ViT; ``qp.fused_sdpa=True`` still forces the kernel.
        allow = qp.fused_sdpa if qp.fused_sdpa is not None else False
        if (qp.fast and not qp.estimating and allow
                and sdpa_fits_vmem(t, s.num_heads, s.num_heads, head_dim, t)):
            # serving modes: fused Pallas SDPA — the (B, H, T, T) score
            # tensor never touches HBM (~60 MB x3 per block at batch 32 on
            # the einsum path). Token-major (B, T, H, D) operands: the head
            # split is a free reshape view, so NO transpose/pad relayouts
            # materialize around the kernel (those cost more than the
            # kernel saves — measured r2). bf16 operands are identical to
            # what the MXU's single-pass f32 dot truncates to anyway.
            from ..ops.pallas.attention import fused_sdpa

            tok = lambda u: decoded(u).reshape(
                b, t, s.num_heads, head_dim).astype(jnp.bfloat16)
            ctx = fused_sdpa(tok(q), tok(k), tok(v), s_valid=t)
            ctx = ctx.reshape(b, t, s.hidden_size)
        else:
            def split(u):
                # chained dense outputs arrive as Coded — dequantize inline
                u = decoded(u)
                return u.reshape(
                    b, t, s.num_heads, head_dim).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            # preferred f32: in fast mode q/k/v arrive bf16 (grid-exact); the
            # MXU reads bf16 and accumulates f32, keeping softmax math in f32
            scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                                preferred_element_type=jnp.float32) / jnp.sqrt(
                jnp.asarray(head_dim, jnp.float32)
            )
            probs = nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                             preferred_element_type=jnp.float32)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, s.hidden_size)
        return _ActSite(qc=self.qc, name="context_site")(ctx, qp)


class QuantViTBlock(nn.Module):
    """One encoder layer (vit_quantized.py:244-290)."""

    qc: QuantConfig
    spec: ViTSpec

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        s = self.spec
        act = ACTIVATIONS[s.hidden_act]

        h = QuantLayerNorm(qc=self.qc, epsilon=s.layer_norm_eps,
                           name="layernorm_before")(x, qp)
        h = QuantViTSelfAttention(qc=self.qc, spec=s, name="attention")(h, qp)
        h = QuantDense(qc=self.qc, features=s.hidden_size,
                       name="attention_output")(h, qp)

        # first residual connection + requant (vit_quantized.py:280-281);
        # the add runs in f32 — both operands are grid-exact site outputs
        # (``decoded`` dequantizes chained int8 codes inline; identity else)
        x = _ActSite(qc=self.qc, name="residual1_site")(
            decoded(h).astype(jnp.float32) + decoded(x).astype(jnp.float32),
            qp)

        y = QuantLayerNorm(qc=self.qc, epsilon=s.layer_norm_eps,
                           name="layernorm_after")(x, qp)
        # intermediate: dense (+ its own output quant when quantize_input is
        # off) -> act fn -> site (vit_quantized.py:118-135)
        if self.qc.quantize_input:
            y = QuantDense(qc=self.qc, features=s.mlp_dim, activation=act,
                           name="intermediate")(y, qp)
        else:
            y = QuantDense(qc=self.qc, features=s.mlp_dim,
                           name="intermediate")(y, qp)
            y = act(y)
        y = _ActSite(qc=self.qc, name="intermediate_site")(y, qp)
        # output: dense + residual add + site (vit_quantized.py:137-156)
        y = QuantDense(qc=self.qc, features=s.hidden_size, name="output")(y, qp)
        return _ActSite(qc=self.qc, name="residual2_site")(
            decoded(y).astype(jnp.float32) + decoded(x).astype(jnp.float32),
            qp)


class QuantizedViT(nn.Module):
    """ViT for image classification, NHWC input, logits output."""

    qc: QuantConfig
    spec: ViTSpec = VIT_B_16

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        s = self.spec
        b = x.shape[0]
        p = s.patch_size

        # patch embedding: conv p x p stride p, with bias (QuantConv — no BN
        # follows), then a site on the tokens (vit_quantized.py:56-86)
        emb = QuantConv(
            qc=self.qc, features=s.hidden_size, kernel_size=(p, p),
            strides=(p, p), padding=[(0, 0), (0, 0)], use_bias=True,
            name="patch_projection",
        )(x, qp)
        emb = emb.reshape(b, -1, s.hidden_size)
        emb = decoded(_ActSite(qc=self.qc, name="patch_site")(emb, qp))

        cls = self.param(
            "cls_token", nn.initializers.zeros_init(), (1, 1, s.hidden_size)
        )
        n_tokens = (s.image_size // p) ** 2 + 1
        pos = self.param(
            "position_embeddings", nn.initializers.zeros_init(),
            (1, n_tokens, s.hidden_size),
        )
        emb = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, s.hidden_size)), emb],
                              axis=1)
        emb = emb + pos
        emb = _ActSite(qc=self.qc, name="embeddings_site")(emb, qp)

        h = emb
        for i in range(s.num_layers):
            h = QuantViTBlock(qc=self.qc, spec=s, name=f"layer_{i}")(h, qp)

        # encoder-level site (vit_quantized.py:292-312)
        h = _ActSite(qc=self.qc, name="encoder_site")(h, qp)
        h = QuantLayerNorm(qc=self.qc, epsilon=s.layer_norm_eps,
                           name="layernorm")(h, qp)

        logits = QuantDense(
            qc=self.qc, features=s.num_classes, name="classifier"
        )(h[:, 0, :], qp)
        return decoded(logits)  # chained: logits come back as codes
