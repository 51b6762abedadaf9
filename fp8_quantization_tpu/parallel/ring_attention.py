"""Ring attention: sequence-parallel exact attention over a device mesh.

Green-field capability (the reference has no parallelism and max sequence 197
— SURVEY.md §5.7): long-context prefill where Q, K and V are sharded over the
sequence axis of a ``jax.sharding.Mesh``. Each device keeps its Q block
resident and the K/V blocks rotate around the ring with ``lax.ppermute``
(one ICI hop per step), while a flash-style online softmax accumulates the
exact result — attention over sequences far larger than one chip's VMEM/HBM,
with communication overlapping compute around the ring.

The math is the blockwise-softmax recurrence (m, l, acc) of FlashAttention /
Ring Attention; the result is bitwise-independent of the device count up to
float reassociation (tested against single-device full attention on the
virtual CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30  # finite stand-in for -inf: keeps the online-softmax exp finite


def _ring_attention_local(q, k, v, *, axis_name: str, causal: bool,
                          scale: float):
    """Per-device body under shard_map.

    q: (B, Tq, H, D) local query block; k/v: (B, Tk, H, D) local key/value
    block (same kv-head count as q — GQA expansion happens in the wrapper).
    Returns (B, Tq, H, D).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, tq, h, d = q.shape
    tk = k.shape[1]

    q_pos = idx * tq + jnp.arange(tq)  # global positions of local queries

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(step, carry):
        k_blk, v_blk, m, l, acc = carry
        src = (idx - step) % n  # global block index of the current K/V
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_blk) * scale
        if causal:
            k_pos = src * tk + jnp.arange(tk)
            mask = k_pos[None, :] <= q_pos[:, None]  # (Tq, Tk)
            scores = jnp.where(mask[None, None], scores, _NEG)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))  # (B,H,Tq)
        p = jnp.exp(scores - m_new[..., None])
        if causal:
            p = jnp.where(mask[None, None], p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, v_blk)

        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return k_blk, v_blk, m_new, l, acc

    # mark the zero-init carries as device-varying so the fori_loop carry
    # type matches the loop body's outputs under shard_map's varying-axis
    # tracking
    m0 = jax.lax.pcast(jnp.full((b, h, tq), _NEG, jnp.float32), (axis_name,), to='varying')
    l0 = jax.lax.pcast(jnp.zeros((b, h, tq), jnp.float32), (axis_name,), to='varying')
    acc0 = jax.lax.pcast(jnp.zeros((b, h, tq, d), jnp.float32), (axis_name,), to='varying')
    *_, m, l, acc = jax.lax.fori_loop(0, n, body, (k, v, m0, l0, acc0))

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # (B, Tq, H, D)


def ring_attention(q, k, v, mesh: Mesh, *, seq_axis: str = "data",
                   causal: bool = True, scale: Optional[float] = None):
    """Exact attention with sequence-sharded inputs.

    q/k/v: (B, S, H, D) and (B, S, H_kv, D) global arrays (H_kv must divide
    H; GQA kv heads are broadcast). S must divide evenly by the mesh axis
    size. Returns (B, S, H, D) sharded like q.
    """
    b, s, h, d = q.shape
    h_kv = k.shape[2]
    if h % h_kv:
        raise ValueError(f"num_heads {h} not a multiple of kv heads {h_kv}")
    if h_kv != h:
        k = jnp.repeat(k, h // h_kv, axis=2)
        v = jnp.repeat(v, h // h_kv, axis=2)
    n = mesh.shape[seq_axis]
    if s % n:
        raise ValueError(f"sequence {s} not divisible by mesh axis size {n}")

    spec = P(None, seq_axis, None, None)
    fn = shard_map(
        functools.partial(_ring_attention_local, axis_name=seq_axis,
                          causal=causal,
                          scale=scale if scale is not None else d ** -0.5),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return fn(q, k, v)


def full_attention(q, k, v, *, causal: bool = True,
                   scale: Optional[float] = None):
    """Single-device reference: plain softmax attention, same conventions."""
    d = q.shape[-1]
    h, h_kv = q.shape[2], k.shape[2]
    if h_kv != h:
        k = jnp.repeat(k, h // h_kv, axis=2)
        v = jnp.repeat(v, h // h_kv, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (
        scale if scale is not None else d ** -0.5)
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        mask = jnp.arange(sk)[None, :] <= jnp.arange(sq)[:, None]
        scores = jnp.where(mask[None, None], scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
