"""Eval metrics as pure accumulator pytrees (psum-able across a mesh).

Replaces the reference's ignite ``Accuracy/TopKCategoricalAccuracy/Loss``
(`/root/reference/image_net.py:129-135`) with a functional accumulator: each
batch contributes (correct, topk_correct, loss_sum, count); across devices the
partial sums reduce with ``jax.lax.psum`` (SURVEY.md §5.8) and the final
metrics are ratios — bitwise identical regardless of sharding.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp
import optax


class MetricState(NamedTuple):
    correct: jnp.ndarray      # scalar f32
    topk_correct: jnp.ndarray
    loss_sum: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def zero(cls) -> "MetricState":
        z = jnp.zeros((), jnp.float32)
        return cls(z, z, z, z)

    def merge(self, other: "MetricState") -> "MetricState":
        return MetricState(*(a + b for a, b in zip(self, other)))


def update_metrics(state: MetricState, logits, labels, k: int = 5
                   ) -> MetricState:
    """Fold one batch of (logits, int labels) into the accumulator."""
    labels = labels.astype(jnp.int32)
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(pred == labels).astype(jnp.float32)

    topk = jnp.argsort(logits, axis=-1)[:, -k:]
    topk_correct = jnp.sum(jnp.any(topk == labels[:, None], axis=-1)).astype(
        jnp.float32
    )

    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return MetricState(
        correct=state.correct + correct,
        topk_correct=state.topk_correct + topk_correct,
        loss_sum=state.loss_sum + jnp.sum(loss),
        count=state.count + labels.shape[0],
    )


def finalize_metrics(state: MetricState) -> Dict[str, float]:
    n = float(state.count)
    if n == 0:
        return {"top_1_accuracy": 0.0, "top_5_accuracy": 0.0, "loss": 0.0}
    return {
        "top_1_accuracy": float(state.correct) / n,
        "top_5_accuracy": float(state.topk_correct) / n,
        "loss": float(state.loss_sum) / n,
    }
