"""Paged FP8 KV cache + paged continuous batching for the Llama decoder.

Green-field (no reference analog; the reference has no LLM path at all —
SURVEY.md §2.8). vLLM-style paged attention re-thought for TPU/XLA:

* the KV store is a fixed pool of ``num_pages`` pages of ``page_size`` tokens
  each, shared by every sequence: ``k_pages/v_pages`` are
  (L, N_pages, page_size, H_kv, D) bfloat16 tensors holding FP8-grid values
  (same exact-in-bf16 trick as the dense ``KVCache``);
* each slot owns a row of ``page_table`` (slots, max_pages) int32 mapping its
  logical pages to physical pages. Page 0 is a reserved trash page: writes
  from idle slots and unallocated logical positions land there harmlessly, so
  every device step stays a fixed-shape program with no host-side branches;
* writes are one vectorized scatter (``pool.at[pp, off].set``), reads one
  gather (``pool[page_table]``) — both static-shape, XLA-friendly; attention
  itself is unchanged (the gathered view is position-indexed exactly like the
  dense cache);
* pages are allocated lazily by the host-side ``PageAllocator`` as sequences
  grow and freed at retirement, so HBM holds only pages in use instead of
  ``slots x max_seq`` worst-case slabs.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.sites import FIXED, QuantPhase
from .llama import LlamaSpec
from .sampling import GREEDY, SamplingParams, sample_tokens


class PagedKVCache(NamedTuple):
    """Paged KV cache pytree. Layouts documented in the module docstring."""

    k_pages: jnp.ndarray     # (L, N_pages, page, H_kv, D) bf16
    v_pages: jnp.ndarray     # (L, N_pages, page, H_kv, D) bf16
    page_table: jnp.ndarray  # (B, max_pages) int32; 0 = trash/unallocated
    length: jnp.ndarray      # (B,) int32

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @classmethod
    def zeros(cls, spec: LlamaSpec, batch: int, num_pages: int,
              page_size: int, max_pages: Optional[int] = None,
              dtype=jnp.bfloat16) -> "PagedKVCache":
        mp = max_pages or -(-spec.max_seq_len // page_size)
        shape = (spec.num_layers, num_pages, page_size, spec.num_kv_heads,
                 spec.head_dim)
        return cls(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            page_table=jnp.zeros((batch, mp), jnp.int32),
            length=jnp.zeros((batch,), jnp.int32),
        )


class PageAllocator:
    """Host-side free-list over physical pages 1..N-1 (0 is the trash page)."""

    def __init__(self, num_pages: int):
        self.free: List[int] = list(range(1, num_pages))

    @property
    def num_free(self) -> int:
        return len(self.free)

    def alloc(self, n: int = 1) -> List[int]:
        if n <= 0:
            return []
        if n > len(self.free):
            raise RuntimeError(
                f"KV page pool exhausted: need {n}, have {len(self.free)}")
        out, self.free = self.free[:n], self.free[n:]
        return out

    def release(self, pages: List[int]) -> None:
        self.free.extend(p for p in pages if p != 0)


def _pad_to_bucket(n: int, bucket: int = 16) -> int:
    return max(bucket, -(-n // bucket) * bucket)


class PagedBatcher:
    """Continuous batching over a paged KV pool.

    Same slot protocol as ``serving.ContinuousBatcher`` (admit -> step* ->
    retire), but cache memory is allocated page-by-page as sequences grow.
    The page table lives host-side (numpy) and ships with each step — it is
    (slots x max_pages) int32, a few hundred bytes.
    """

    def __init__(self, model, variables, spec: LlamaSpec, *, slots: int = 4,
                 num_pages: int = 64, page_size: int = 16,
                 max_seq: Optional[int] = None, eos_token: int = -1,
                 qp: QuantPhase = FIXED,
                 sampling: SamplingParams = GREEDY, seed: int = 0):
        self.model = model
        self.variables = variables
        self.spec = spec
        self.slots = slots
        self.page_size = page_size
        self.max_seq = max_seq or spec.max_seq_len
        max_pages = -(-self.max_seq // page_size)
        self.eos_token = eos_token
        self.qp = qp

        self.allocator = PageAllocator(num_pages)
        self.table = np.zeros((slots, max_pages), np.int32)
        self.lengths = np.zeros((slots,), np.int32)
        cache0 = PagedKVCache.zeros(
            spec, slots, num_pages, page_size, max_pages,
            dtype=jnp.uint8 if getattr(model, "packed_kv", False)
            else jnp.bfloat16)
        self.k_pages, self.v_pages = cache0.k_pages, cache0.v_pages

        self.free_slots: List[int] = list(range(slots))
        self.active: Dict[int, dict] = {}

        import functools

        # donate the cache: the page pools are updated in place by the decode
        # scatter instead of being copied every step (page_table/length are
        # rebuilt from host state each step, so only the pools matter)
        self.sampling = sampling
        self._key = jax.random.key(seed)
        self._step_count = 0

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(variables, tokens, cache, key):
            logits, cache = model.apply(variables, tokens, cache, qp)
            return sample_tokens(logits[:, -1, :], sampling, key), cache

        self._decode = decode_step
        self._prefill_jit = {}

    def _next_key(self):
        self._step_count += 1
        return jax.random.fold_in(self._key, self._step_count)

    # -- page bookkeeping ---------------------------------------------------

    def _ensure_pages(self, slot: int, upto_tokens: int) -> None:
        """Allocate pages so slot can hold ``upto_tokens`` tokens."""
        need = -(-upto_tokens // self.page_size)
        row = self.table[slot]
        have = int(np.count_nonzero(row))
        if need > len(row):
            raise RuntimeError(f"sequence exceeds max_seq ({self.max_seq})")
        if need <= have:
            return
        for i, p in zip(range(have, need), self.allocator.alloc(need - have)):
            row[i] = p

    def _cache(self) -> PagedKVCache:
        return PagedKVCache(
            k_pages=self.k_pages, v_pages=self.v_pages,
            page_table=jnp.asarray(self.table),
            length=jnp.asarray(self.lengths),
        )

    # -- serving protocol ---------------------------------------------------

    def admit(self, prompt: List[int], max_new_tokens: int = 32) -> int:
        """Prefill a prompt into a free slot; returns the slot id."""
        if not self.free_slots:
            raise RuntimeError("no free slots")
        slot = self.free_slots.pop(0)
        real = len(prompt)
        t_pad = _pad_to_bucket(real)
        # padded prefill positions write into [0, t_pad); allocate for them
        self._ensure_pages(slot, t_pad)
        tokens = np.zeros((1, t_pad), np.int32)
        tokens[0, :real] = prompt

        if t_pad not in self._prefill_jit:
            model, qp, sampling = self.model, self.qp, self.sampling

            @jax.jit
            def prefill(variables, tokens, cache, real_len, key):
                # batch-1 prefill over the slot's page-table row only: the
                # page pool is shared, so writes land in the slot's pages
                # without touching other slots' cached KV. chunk_attention:
                # attend over the prompt chunk, not the gathered logical view
                logits, cache = model.apply(variables, tokens, cache, qp,
                                            chunk_attention=True)
                next_tok = sample_tokens(logits[:1, real_len - 1, :],
                                         sampling, key)[0]
                return next_tok, cache.k_pages, cache.v_pages

            self._prefill_jit[t_pad] = prefill

        slot_cache = PagedKVCache(
            k_pages=self.k_pages, v_pages=self.v_pages,
            page_table=jnp.asarray(self.table[slot:slot + 1]),
            length=jnp.zeros((1,), jnp.int32),
        )
        next_tok, self.k_pages, self.v_pages = self._prefill_jit[t_pad](
            self.variables, jnp.asarray(tokens), slot_cache,
            jnp.asarray(real), self._next_key())

        self.lengths[slot] = real
        first = int(next_tok)
        self.active[slot] = {
            "generated": [first],
            "remaining": max_new_tokens - 1,
            "done": first == self.eos_token or max_new_tokens <= 1,
        }
        return slot

    def step(self) -> Dict[int, int]:
        """One batched decode step for every active unfinished slot."""
        live = [s for s, st in self.active.items() if not st["done"]]
        if not live:
            return {}
        tokens = np.zeros((self.slots, 1), np.int32)
        for s in live:
            tokens[s, 0] = self.active[s]["generated"][-1]
            self._ensure_pages(s, int(self.lengths[s]) + 1)

        next_tokens, cache = self._decode(self.variables,
                                          jnp.asarray(tokens), self._cache(),
                                          self._next_key())
        self.k_pages, self.v_pages = cache.k_pages, cache.v_pages

        out: Dict[int, int] = {}
        nt = np.asarray(next_tokens)
        for s in live:
            tok = int(nt[s])
            st = self.active[s]
            self.lengths[s] += 1
            st["generated"].append(tok)
            st["remaining"] -= 1
            out[s] = tok
            if tok == self.eos_token or st["remaining"] <= 0 or (
                int(self.lengths[s]) >= self.max_seq - 1
            ):
                st["done"] = True
        return out

    def retire(self, slot: int) -> List[int]:
        """Free a finished slot and its pages; returns its generated tokens."""
        st = self.active.pop(slot)
        self.allocator.release([int(p) for p in self.table[slot] if p])
        self.table[slot] = 0
        self.lengths[slot] = 0
        self.free_slots.append(slot)
        return st["generated"]

    def run_to_completion(self, max_steps: int = 1000) -> None:
        for _ in range(max_steps):
            if not self.step():
                return
