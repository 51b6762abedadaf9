"""Prefix caching: reuse prefilled KV across requests sharing a prompt prefix.

Green-field serving capability (vLLM-style "automatic prefix caching"
re-thought for the fixed-shape XLA serving step): system prompts and few-shot
headers repeat across requests, so their KV is computed once, kept on device,
and copied into a slot at admission — the prefill then runs only over the
remainder tokens with ``cache.length`` starting at the prefix length (the
decoder's normal cache-attention path; bitwise the same values the full
prefill would have produced, since prefix KV depends only on prefix tokens).

Prefixes are stored at bucket granularity (multiples of ``bucket``) so a
cached entry serves every prompt sharing at least that many leading tokens,
and lookups pick the longest stored bucket that matches. Eviction is plain
LRU on a token budget.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List, Optional, Tuple

import jax.numpy as jnp


class PrefixCache:
    """Host-side LRU over on-device prefix KV slabs.

    Entries map ``tuple(prompt[:L])`` (L a bucket multiple) to
    ``(k, v)`` arrays of shape (layers, 1, L, H_kv, D) — the same layout a
    batch-1 slice of the dense ``KVCache`` has, in the cache's dtype (bf16 or
    packed uint8 codes).
    """

    def __init__(self, max_tokens: int = 4096, bucket: int = 16,
                 max_entry_tokens: Optional[int] = None):
        """``max_entry_tokens`` caps how many leading tokens one entry may
        hold (default ``max_tokens // 4``): a single long unique prompt then
        cannot evict every shared system-prompt entry from the LRU budget —
        only its head (the part plausibly shared) is stored."""
        self.max_tokens = max_tokens
        self.bucket = bucket
        if max_entry_tokens is None:
            max_entry_tokens = max(bucket, max_tokens // 4)
        self.max_entry_tokens = (max_entry_tokens // bucket) * bucket
        self._entries: "OrderedDict[Tuple[int, ...], Tuple]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    @property
    def cached_tokens(self) -> int:
        return sum(len(k) for k in self._entries)

    def lookup(self, prompt: List[int]) -> Optional[Tuple[int, jnp.ndarray,
                                                          jnp.ndarray]]:
        """Longest usable shared prefix; returns (len, k, v) or None.

        An entry serves a prompt that shares ANY bucket-aligned leading run
        with it — the slab is sliced to the shared length (KV at position i
        depends only on tokens [0, i]), so entries stored from one request's
        full prompt (including its unique tail) still serve siblings that
        share only the system-prompt part. Only proper prefixes are returned
        (len < len(prompt)): admission needs at least one token to prefill
        for the next-token logits. Results are always bucket multiples — a
        full-prompt match drops a whole bucket rather than clamping to
        len(prompt)-1, so the warm-admission jit specializes on few distinct
        prefix lengths (each remote TPU compile costs 30-300 s).
        """
        best, best_key = 0, None
        for key in self._entries:
            j = 0
            for a, b in zip(key, prompt):
                if a != b:
                    break
                j += 1
            j = (j // self.bucket) * self.bucket
            if j >= len(prompt):
                j = ((len(prompt) - 1) // self.bucket) * self.bucket
            if j > best:
                best, best_key = j, key
        if best <= 0:
            self.misses += 1
            return None
        self._entries.move_to_end(best_key)
        self.hits += 1
        k, v = self._entries[best_key]
        return best, k[:, :, :best], v[:, :, :best]

    def store(self, prompt: List[int], k_slab, v_slab) -> int:
        """Cache the bucket-truncated prefix of ``prompt``; the slabs are
        (layers, 1, >=L, H_kv, D) slot slices. Returns the stored length
        (0 when the prompt is shorter than one bucket)."""
        lb = (len(prompt) // self.bucket) * self.bucket
        lb = min(lb, self.max_entry_tokens)
        if lb == 0:
            return 0
        key = tuple(prompt[:lb])
        if key in self._entries:
            self._entries.move_to_end(key)
            return lb
        self._entries[key] = (k_slab[:, :, :lb], v_slab[:, :, :lb])
        self._entries.move_to_end(key)
        while self.cached_tokens > self.max_tokens and len(self._entries) > 1:
            self._entries.popitem(last=False)
        return lb
