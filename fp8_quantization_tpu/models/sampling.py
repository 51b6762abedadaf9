"""Token sampling for the serving batchers: greedy / temperature / top-k /
top-p (nucleus), as one jittable function.

Green-field (the reference has no generation at all — SURVEY §2.8); the
design follows standard LLM-serving practice re-expressed for XLA: masks are
built with static-shape ``top_k``/sort + cumsum (no dynamic shapes under
jit), and greedy is a *static* branch so the common case compiles to a bare
argmax with no RNG traffic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingParams(NamedTuple):
    """Static sampling configuration (hashable; safe as a jit closure)."""

    temperature: float = 0.0   # 0 => greedy
    top_k: int = 0             # 0 => disabled
    top_p: float = 1.0         # 1 => disabled

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


GREEDY = SamplingParams()


def filtered_logits(logits, params: SamplingParams):
    """Temperature-scaled logits with the top-k / top-p mask applied
    (``-inf`` outside the support). The shared mask builder for sampling and
    for speculative accept/reject (which needs the *distribution*, not just
    a sample). Requires ``temperature > 0``.

    Filtering order (the standard one): top-k first, then top-p on the
    renormalized survivors.
    """
    scaled = jnp.asarray(logits, jnp.float32) / params.temperature

    if params.top_k and params.top_k > 0:
        kth = jax.lax.top_k(scaled, params.top_k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)

    if params.top_p < 1.0:
        # nucleus: keep the smallest prefix of the sorted distribution whose
        # mass reaches top_p (the first token always survives)
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = cum - probs < params.top_p
        # threshold logit = smallest kept logit per row
        thr = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                      axis=-1, keepdims=True)
        scaled = jnp.where(scaled < thr, -jnp.inf, scaled)

    return scaled


def filtered_probs(logits, params: SamplingParams):
    """The normalized distribution sampling actually draws from — softmax of
    :func:`filtered_logits`."""
    return jax.nn.softmax(filtered_logits(logits, params), axis=-1)


def sample_tokens(logits, params: SamplingParams, key=None):
    """Sample one token per row. logits: (B, V) -> (B,) int32."""
    logits = jnp.asarray(logits, jnp.float32)
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if key is None:
        raise ValueError("sampling with temperature > 0 needs a PRNG key")
    return jax.random.categorical(
        key, filtered_logits(logits, params), axis=-1
    ).astype(jnp.int32)
