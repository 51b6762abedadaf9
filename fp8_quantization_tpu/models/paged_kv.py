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


def _gather_slot_slabs(cache: PagedKVCache):
    """Slot's logical KV view as dense (L, 1, S_max, H_kv, D) slabs — the
    layout ``PrefixCache`` stores (interchangeable with a dense
    ``ContinuousBatcher`` slot slice). Batch-1 page table expected."""
    l, _, page, h, d = cache.k_pages.shape
    s_max = cache.page_table.shape[1] * page
    row = cache.page_table[0]
    k = cache.k_pages[:, row].reshape(l, 1, s_max, h, d)
    v = cache.v_pages[:, row].reshape(l, 1, s_max, h, d)
    return k, v


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
                 sampling: SamplingParams = GREEDY, seed: int = 0,
                 mesh=None, prefix_cache=None,
                 draft_model=None, draft_variables=None,
                 draft_spec: Optional[LlamaSpec] = None, spec_k: int = 4,
                 draft_qp: Optional[QuantPhase] = None):
        """``draft_model``/``draft_variables``/``draft_spec``: optional draft
        for batched SPECULATIVE decoding over the paged pool (completes the
        serving composition matrix — ROADMAP "speculative + paged"). Each
        :meth:`step` then runs ``spec_k`` draft proposals per live slot and
        ONE (slots, k+1)-token target verify whose KV scatters land in the
        slot's pages (allocated up front for the full round). Rollback over
        the page table is pure host bookkeeping: physical pages are already
        owned by the slot, so rejecting tokens just means ``lengths`` only
        advances to the accepted frontier — rejected positions are dead data
        in the slot's own pages, overwritten by the next round's scatter
        (the same masking trick as the trash-page writes). The draft keeps a
        DENSE (slots, max_seq) slab: paging exists to bound the BIG model's
        KV HBM; the draft is small by design and a dense slab keeps its
        k-step scan free of per-step gather/scatter overhead.

        ``prefix_cache``: optional :class:`~.prefix_cache.PrefixCache` —
        warm admissions SCATTER the cached dense prefix slab into the
        slot's pages (allocated up front) and prefill only the remainder
        with ``length`` starting at the prefix length; stores GATHER the
        slot's logical view back to the dense (L, 1, S, H_kv, D) layout, so
        entries are interchangeable with the dense ``ContinuousBatcher``'s.

        ``mesh``: optional ``jax.sharding.Mesh`` with (data, model) axes —
        same convenience as ``ContinuousBatcher``: variables shard per
        ``parallel.sharding`` rules and every jitted step traces under
        ``partitioned_kernels``. The page POOL shards its KV-head axis over
        ``model`` (when divisible) and stays replicated over ``data``: any
        slot may own any physical page, so there is no per-slot pool shard
        — the (B, ...) page-table gather/scatter lets GSPMD batch-partition
        the attention while the pool itself is the shared resource.
        """
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
        self.prefix_cache = prefix_cache
        self.mesh = mesh

        self.draft = draft_model
        self.draft_spec = draft_spec
        self.draft_qp = draft_qp or qp
        self.spec_k = spec_k
        self.proposed = 0   # speculative telemetry (SpecStats analog)
        self.accepted = 0
        if draft_model is not None:
            from .llama import KVCache

            self.draft_cache = KVCache.zeros(
                draft_spec, slots, self.max_seq,
                dtype=jnp.uint8 if getattr(draft_model, "packed_kv", False)
                else jnp.bfloat16)
        else:
            self.draft_cache = None

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import shard_variables

            if slots % mesh.shape["data"] != 0:
                raise ValueError(
                    f"slots ({slots}) must divide over the data axis "
                    f"({mesh.shape['data']})"
                )
            variables = shard_variables(variables, mesh)
            pool_spec = P(None, None, None,
                          "model"
                          if spec.num_kv_heads % mesh.shape["model"] == 0
                          else None, None)
            self.k_pages = jax.device_put(self.k_pages,
                                          NamedSharding(mesh, pool_spec))
            self.v_pages = jax.device_put(self.v_pages,
                                          NamedSharding(mesh, pool_spec))
            if draft_model is not None:
                draft_variables = shard_variables(draft_variables, mesh)
                dkv_spec = P(None, "data", None,
                             "model"
                             if draft_spec.num_kv_heads
                             % mesh.shape["model"] == 0
                             else None, None)
                self.draft_cache = KVCache(
                    k=jax.device_put(self.draft_cache.k,
                                     NamedSharding(mesh, dkv_spec)),
                    v=jax.device_put(self.draft_cache.v,
                                     NamedSharding(mesh, dkv_spec)),
                    length=jax.device_put(
                        self.draft_cache.length,
                        NamedSharding(mesh, P("data"))),
                )
        self.variables = variables
        self.draft_variables = draft_variables

        import functools

        # donate the cache: the page pools are updated in place by the decode
        # scatter instead of being copied every step (page_table/length are
        # rebuilt from host state each step, so only the pools matter)
        self.sampling = sampling
        self._key = jax.random.key(seed)
        self._step_count = 0

        @self._partitioned
        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(variables, tokens, cache, key):
            logits, cache = model.apply(variables, tokens, cache, qp)
            return sample_tokens(logits[:, -1, :], sampling, key), cache

        self._decode = decode_step
        if draft_model is not None:
            self._spec_step = self._build_spec_step()
        self._prefill_jit = {}

    def _partitioned(self, fn):
        """Trace ``fn`` under ``partitioned_kernels`` when this batcher has
        a mesh, so packed/int4 Pallas kernels tensor-parallelize via
        shard_map (see serving.ContinuousBatcher._partitioned — the
        contextvar is a trace-time switch, so it must wrap the first CALL)."""
        if self.mesh is None:
            return fn
        from ..parallel.shard_kernels import partitioned_kernels

        def wrapped(*a, **k):
            with partitioned_kernels(self.mesh):
                return fn(*a, **k)

        return wrapped

    def _build_spec_step(self):
        """Compile the batched speculative round over the paged pool: the
        shared :func:`~.speculative.batched_spec_round` core with the target
        verify running through the page-table scatter/gather path. Lengths
        and the page table are rebuilt from host state every call (exactly
        like the non-speculative step), so per-slot rollback needs NO
        device-side masking here — the host simply advances ``lengths`` to
        each slot's accepted frontier."""
        import functools

        from .llama import KVCache
        from .speculative import batched_spec_round

        model, qp, sampling = self.model, self.qp, self.sampling
        draft_model, draft_qp = self.draft, self.draft_qp
        k_ = self.spec_k

        @functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5))
        def spec_step(tvars, dvars, k_pages, v_pages, dk, dv, page_table,
                      lengths, tokens_cur, key):
            t_cache = PagedKVCache(k_pages=k_pages, v_pages=v_pages,
                                   page_table=page_table, length=lengths)
            d_cache = KVCache(k=dk, v=dv, length=lengths)
            emitted, m, t_cache, d_cache = batched_spec_round(
                draft_model, dvars, d_cache, draft_qp,
                lambda toks: model.apply(tvars, toks, t_cache, qp),
                tokens_cur, k_, sampling, key)
            return (emitted, m, t_cache.k_pages, t_cache.v_pages,
                    d_cache.k, d_cache.v)

        return self._partitioned(spec_step)

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

    def _resume_admit_fn(self, t_pad: int):
        """Warm paged admission as ONE jitted call: scatter the dense prefix
        slab into the slot's pages + prefill the remainder over the
        cache-attention path + gather the slot's logical slab back for the
        prefix store. Fused for the same reason the dense batcher's is
        (each eager dispatch costs ~29 ms over the tunnel). The prefix
        length is read from ``k_pref.shape[2]`` so jit specializes on
        (t_pad, bucket-aligned prefix length) pairs only."""
        key_ = ("resume", t_pad)
        if key_ not in self._prefill_jit:
            model, qp, sampling = self.model, self.qp, self.sampling

            @jax.jit
            def admit(variables, k_pages, v_pages, table_row, tokens,
                      k_pref, v_pref, real_len, rkey):
                lp = k_pref.shape[2]
                page = k_pages.shape[2]
                pos = jnp.arange(lp)
                pp = table_row[0, pos // page]
                off = pos % page
                # scatter prefix KV into the slot's pages: logical position
                # i -> (physical page pp[i], offset off[i]); pages were
                # allocated by the caller, so no trash-page writes here
                k_pages = k_pages.at[:, pp, off].set(k_pref[:, 0])
                v_pages = v_pages.at[:, pp, off].set(v_pref[:, 0])
                cache = PagedKVCache(
                    k_pages=k_pages, v_pages=v_pages, page_table=table_row,
                    length=jnp.full((1,), lp, jnp.int32))
                logits, cache = model.apply(variables, tokens, cache, qp)
                next_tok = sample_tokens(logits[:1, real_len - 1, :],
                                         sampling, rkey)[0]
                k_slab, v_slab = _gather_slot_slabs(cache)
                return (next_tok, cache.k_pages, cache.v_pages, k_slab,
                        v_slab)

            self._prefill_jit[key_] = self._partitioned(admit)
        return self._prefill_jit[key_]

    # -- serving protocol ---------------------------------------------------

    def admit(self, prompt: List[int], max_new_tokens: int = 32) -> int:
        """Prefill a prompt into a free slot; returns the slot id.

        With a ``prefix_cache``, the longest cached prefix's dense KV slab
        is scattered into the slot's pages and only the remainder tokens
        are prefilled (value-identical: prefix KV depends only on prefix
        tokens, and the paged cache-attention path reads the same logical
        positions the full prefill would have written)."""
        if not self.free_slots:
            raise RuntimeError("no free slots")
        slot = self.free_slots.pop(0)
        real = len(prompt)
        want_store = self.prefix_cache is not None

        pref = self.prefix_cache.lookup(prompt) if want_store else None
        if pref is not None and (
            pref[0] + _pad_to_bucket(real - pref[0]) > self.max_seq
        ):
            # padded remainder would spill past the slot's logical range
            pref = None
        if pref is not None:
            lp, k_pref, v_pref = pref
            rem = prompt[lp:]
            t_pad = _pad_to_bucket(len(rem))
            # pages for prefix scatter + padded remainder writes
            self._ensure_pages(slot, lp + t_pad)
            tokens = np.zeros((1, t_pad), np.int32)
            tokens[0, : len(rem)] = rem
            next_tok, self.k_pages, self.v_pages, k_slab, v_slab = (
                self._resume_admit_fn(t_pad)(
                    self.variables, self.k_pages, self.v_pages,
                    jnp.asarray(self.table[slot:slot + 1]),
                    jnp.asarray(tokens), k_pref, v_pref,
                    jnp.asarray(len(rem)), self._next_key()))
        else:
            t_pad = _pad_to_bucket(real)
            # padded prefill positions write into [0, t_pad); allocate
            self._ensure_pages(slot, t_pad)
            tokens = np.zeros((1, t_pad), np.int32)
            tokens[0, :real] = prompt

            key_ = ("prefill", t_pad, want_store)
            if key_ not in self._prefill_jit:
                model, qp, sampling = self.model, self.qp, self.sampling

                @jax.jit
                def prefill(variables, tokens, cache, real_len, key):
                    # batch-1 prefill over the slot's page-table row only:
                    # the page pool is shared, so writes land in the slot's
                    # pages without touching other slots' cached KV.
                    # chunk_attention: attend over the prompt chunk, not the
                    # gathered logical view
                    logits, cache = model.apply(variables, tokens, cache, qp,
                                                chunk_attention=True)
                    next_tok = sample_tokens(logits[:1, real_len - 1, :],
                                             sampling, key)[0]
                    out = (next_tok, cache.k_pages, cache.v_pages)
                    if want_store:
                        out += _gather_slot_slabs(cache)
                    return out

                self._prefill_jit[key_] = self._partitioned(prefill)

            slot_cache = PagedKVCache(
                k_pages=self.k_pages, v_pages=self.v_pages,
                page_table=jnp.asarray(self.table[slot:slot + 1]),
                length=jnp.zeros((1,), jnp.int32),
            )
            out = self._prefill_jit[key_](
                self.variables, jnp.asarray(tokens), slot_cache,
                jnp.asarray(real), self._next_key())
            next_tok, self.k_pages, self.v_pages = out[:3]
            if want_store:
                k_slab, v_slab = out[3:]

        if want_store:
            self.prefix_cache.store(prompt, k_slab, v_slab)

        if self.draft is not None:
            # draft cache admission: cold full-prompt prefill of the draft
            # into the parallel DENSE slot slab (invariant matches the
            # target's: the draft cache holds KV for prompt+generated[:-1])
            from .llama import KVCache

            dkey = ("draft", t_pad)
            if dkey not in self._prefill_jit:
                draft_model, draft_qp = self.draft, self.draft_qp

                @jax.jit
                def dprefill(dvars, tokens, k, v):
                    sub = KVCache(k=k, v=v, length=jnp.zeros((1,), jnp.int32))
                    _, sub = draft_model.apply(dvars, tokens, sub, draft_qp,
                                               chunk_attention=True)
                    return sub.k, sub.v

                self._prefill_jit[dkey] = self._partitioned(dprefill)
            dk = jax.lax.dynamic_slice_in_dim(self.draft_cache.k, slot, 1,
                                              axis=1)
            dv = jax.lax.dynamic_slice_in_dim(self.draft_cache.v, slot, 1,
                                              axis=1)
            dk_new, dv_new = self._prefill_jit[dkey](
                self.draft_variables, jnp.asarray(tokens), dk, dv)
            self.draft_cache = self.draft_cache._replace(
                k=jax.lax.dynamic_update_slice_in_dim(
                    self.draft_cache.k, dk_new, slot, axis=1),
                v=jax.lax.dynamic_update_slice_in_dim(
                    self.draft_cache.v, dv_new, slot, axis=1),
            )

        self.lengths[slot] = real
        first = int(next_tok)
        self.active[slot] = {
            "generated": [first],
            "remaining": max_new_tokens - 1,
            "done": first == self.eos_token or max_new_tokens <= 1,
        }
        return slot

    def step(self) -> Dict[int, int]:
        """One batched decode step for every active unfinished slot.

        With a draft model configured this is a batched SPECULATIVE round:
        each live slot advances by 1..spec_k+1 tokens (see
        :meth:`_step_speculative`)."""
        if self.draft is not None:
            return self._step_speculative()
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

    def _step_speculative(self) -> Dict[int, int]:
        """One batched speculative round over the paged pool (see
        :meth:`step`). Pages for the full k+1-token round are allocated
        before the device step; rollback keeps them (the next round reuses
        them — they are only released at :meth:`retire`)."""
        k = self.spec_k
        live = []
        for s, st in self.active.items():
            if st["done"]:
                continue
            if int(self.lengths[s]) + k + 2 > self.max_seq:
                # no room for a full k+1-token round in the slot's table
                # (same cut as serving.ContinuousBatcher._step_speculative:
                # lengths == plen + len(generated) - 1)
                st["done"] = True
                continue
            live.append(s)
        if not live:
            return {}
        tokens = np.zeros((self.slots,), np.int32)
        for s in live:
            tokens[s] = self.active[s]["generated"][-1]
            self._ensure_pages(s, int(self.lengths[s]) + k + 1)

        emitted, m, self.k_pages, self.v_pages, dk, dv = self._spec_step(
            self.variables, self.draft_variables, self.k_pages, self.v_pages,
            self.draft_cache.k, self.draft_cache.v,
            jnp.asarray(self.table), jnp.asarray(self.lengths),
            jnp.asarray(tokens), self._next_key(),
        )
        self.draft_cache = self.draft_cache._replace(k=dk, v=dv)
        em = np.asarray(emitted)
        mm = np.asarray(m)

        out: Dict[int, int] = {}
        for s in live:
            st = self.active[s]
            acc = int(mm[s])
            self.proposed += k
            self.accepted += acc
            kept = 0
            for tok in em[s][: acc + 1].tolist():
                tok = int(tok)
                st["generated"].append(tok)
                st["remaining"] -= 1
                kept += 1
                out[s] = tok
                if tok == self.eos_token or st["remaining"] <= 0:
                    # truncated mid-round: the slot is done, so the page
                    # frontier past the kept tokens is dead data
                    st["done"] = True
                    break
            self.lengths[s] += kept
        return out

    @property
    def acceptance_rate(self) -> float:
        """Draft-token acceptance across all speculative rounds so far."""
        return self.accepted / max(self.proposed, 1)

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
