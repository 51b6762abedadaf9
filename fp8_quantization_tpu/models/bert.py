"""Quantized BERT-base for sequence classification (GLUE), TPU-native (flax).

The reference's NLP path is a stub — ``models/bert_quantized.py:20-28`` loads
HF bert-base and runs one unquantized sentence; ``nlp.py`` just calls it.
Here the path is done properly (SURVEY.md §7): a quantized BERT with the same
site placement policy as the quantized ViT (the reference's treatment of
transformer blocks, models/vit_quantized.py):

* quantized word/position/token-type embedding lookups feed a QuantLayerNorm
* per block (post-LN architecture): quantized q/k/v -> unquantized SDPA with
  attention mask -> context site -> output QuantDense -> residual add ->
  QuantLayerNorm; intermediate QuantDense+GELU+site -> output QuantDense ->
  residual add -> QuantLayerNorm
* pooler QuantDense+tanh, classifier QuantDense

Weights load from HF ``BertForSequenceClassification`` checkpoints via
``porting.port_bert``.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..config import QuantConfig
from ..ops.activations import ACTIVATIONS
from ..ops.layers import QuantDense, QuantLayerNorm
from ..quant.sites import FIXED, QuantPhase, QuantSite


@dataclasses.dataclass(frozen=True)
class BertSpec:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    num_classes: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"


BERT_BASE = BertSpec()


class _ActSite(nn.Module):
    qc: QuantConfig

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        if qp.quant_a:
            x = QuantSite(self.qc.act_quantizer(), self.qc.act_range,
                          name="activation_quantizer")(x, qp)
        return x


class QuantBertSelfAttention(nn.Module):
    qc: QuantConfig
    spec: BertSpec

    @nn.compact
    def __call__(self, x, attention_mask, qp: QuantPhase = FIXED):
        s = self.spec
        head_dim = s.hidden_size // s.num_heads
        b, t, _ = x.shape

        q = QuantDense(qc=self.qc, features=s.hidden_size, name="query")(x, qp)
        k = QuantDense(qc=self.qc, features=s.hidden_size, name="key")(x, qp)
        v = QuantDense(qc=self.qc, features=s.hidden_size, name="value")(x, qp)

        def split(h):
            return h.reshape(b, t, s.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        # preferred f32: in fast mode q/k/v arrive bf16 (grid-exact); the
        # MXU reads bf16 and accumulates f32, keeping softmax math in f32
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(head_dim, jnp.float32)
        )
        if attention_mask is not None:
            bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * -1e9
            scores = scores + bias
        probs = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, s.hidden_size)
        return _ActSite(qc=self.qc, name="context_site")(ctx, qp)


class QuantBertBlock(nn.Module):
    qc: QuantConfig
    spec: BertSpec

    @nn.compact
    def __call__(self, x, attention_mask, qp: QuantPhase = FIXED):
        s = self.spec
        act = ACTIVATIONS[s.hidden_act]

        h = QuantBertSelfAttention(qc=self.qc, spec=s, name="attention")(
            x, attention_mask, qp
        )
        h = QuantDense(qc=self.qc, features=s.hidden_size,
                       name="attention_output")(h, qp)
        x = QuantLayerNorm(qc=self.qc, epsilon=s.layer_norm_eps,
                           name="attention_layernorm")(h + x, qp)

        if self.qc.quantize_input:
            y = QuantDense(qc=self.qc, features=s.mlp_dim, activation=act,
                           name="intermediate")(x, qp)
        else:
            y = QuantDense(qc=self.qc, features=s.mlp_dim,
                           name="intermediate")(x, qp)
            y = act(y)
        y = _ActSite(qc=self.qc, name="intermediate_site")(y, qp)
        y = QuantDense(qc=self.qc, features=s.hidden_size, name="output")(y, qp)
        return QuantLayerNorm(qc=self.qc, epsilon=s.layer_norm_eps,
                              name="output_layernorm")(y + x, qp)


class QuantizedBert(nn.Module):
    """BERT-base for sequence classification (GLUE tasks)."""

    qc: QuantConfig
    spec: BertSpec = BERT_BASE

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 qp: QuantPhase = FIXED):
        s = self.spec
        b, t = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (s.vocab_size, s.hidden_size))
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (s.max_position_embeddings, s.hidden_size))
        typ = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                         (s.type_vocab_size, s.hidden_size))

        emb = (word[input_ids] + pos[jnp.arange(t)][None, :, :]
               + typ[token_type_ids])
        emb = QuantLayerNorm(qc=self.qc, epsilon=s.layer_norm_eps,
                             name="embeddings_layernorm")(emb, qp)

        h = emb
        for i in range(s.num_layers):
            h = QuantBertBlock(qc=self.qc, spec=s, name=f"layer_{i}")(
                h, attention_mask, qp
            )

        pooled = QuantDense(qc=self.qc, features=s.hidden_size,
                            activation=jnp.tanh, name="pooler")(h[:, 0, :], qp)
        return QuantDense(qc=self.qc, features=s.num_classes,
                          name="classifier")(pooled, qp)
