"""Slot-based continuous batching for the quantized Llama decoder.

Green-field serving layer (BASELINE configs[4]): a fixed-capacity batch of
cache slots; sequences are admitted into free slots (right-padded prefill —
safe because causal masking hides later positions and decode overwrites the
padded cache region), every decode step is ONE fixed-shape jitted SPMD
program over all active slots, and finished sequences retire their slot for
the next admission. Host-side bookkeeping only touches scalars; the cache
pytree lives on device (shardable over the mesh: batch on ``data``, heads on
``model``).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.sites import FIXED, QuantPhase
from .llama import KVCache, LlamaSpec
from .sampling import GREEDY, SamplingParams, sample_tokens


def _pad_to_bucket(n: int, bucket: int = 16) -> int:
    return max(bucket, -(-n // bucket) * bucket)


class ContinuousBatcher:
    """Continuous batching over a fixed slot capacity."""

    def __init__(self, model, variables, spec: LlamaSpec, *, slots: int = 4,
                 max_seq: Optional[int] = None, eos_token: int = -1,
                 qp: QuantPhase = FIXED, mesh=None,
                 sampling: SamplingParams = GREEDY, seed: int = 0,
                 prefix_cache=None, draft_model=None, draft_variables=None,
                 draft_spec: Optional[LlamaSpec] = None, spec_k: int = 4,
                 draft_qp: Optional[QuantPhase] = None):
        """``mesh``: optional ``jax.sharding.Mesh`` with (data, model) axes —
        SURVEY §7 build order #8 ("continuous batching across hosts"): slots
        shard over ``data``, weights/per-channel quant params over ``model``
        (parallel/sharding.py rules), and every decode step stays ONE
        fixed-shape GSPMD program over the whole mesh. Requires
        ``slots % data == 0``.

        ``draft_model``/``draft_variables``/``draft_spec``: optional draft
        for BATCHED speculative decoding (VERDICT r4 next #3 — the composed
        serving stack): every :meth:`step` then runs ``spec_k`` draft
        proposals per live slot as one fixed-shape scan plus ONE
        (slots, k+1)-token target verify, advancing each slot by 1..k+1
        tokens with per-slot rollback (``length`` masking — rejected
        positions become dead data exactly like idle-slot writes). Greedy
        sampling stays token-identical to the non-speculative batcher;
        stochastic sampling keeps the :func:`~.speculative.spec_accept`
        exact-target-distribution guarantee per slot (vmapped). Composes
        with ``prefix_cache`` (target warm-splices; the draft cold-prefills
        its own cache) and with packed (uint8) KV on either model."""
        self.model = model
        self.spec = spec
        self.slots = slots
        self.max_seq = max_seq or spec.max_seq_len
        self.eos_token = eos_token
        self.qp = qp
        self.mesh = mesh
        self.draft = draft_model
        self.draft_spec = draft_spec
        self.draft_qp = draft_qp or qp
        self.spec_k = spec_k
        self.proposed = 0   # speculative telemetry (SpecStats analog)
        self.accepted = 0

        def _slot_cache(m, sp):
            return KVCache.zeros(
                sp, slots, self.max_seq,
                dtype=jnp.uint8 if getattr(m, "packed_kv", False)
                else jnp.bfloat16)

        cache = _slot_cache(model, spec)
        d_cache = (_slot_cache(draft_model, draft_spec)
                   if draft_model is not None else None)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import shard_variables

            if slots % mesh.shape["data"] != 0:
                raise ValueError(
                    f"slots ({slots}) must divide over the data axis "
                    f"({mesh.shape['data']})"
                )
            variables = shard_variables(variables, mesh)

            def _shard_cache(c, sp):
                kv_spec = P(None, "data", None,
                            "model"
                            if sp.num_kv_heads % mesh.shape["model"] == 0
                            else None, None)
                return KVCache(
                    k=jax.device_put(c.k, NamedSharding(mesh, kv_spec)),
                    v=jax.device_put(c.v, NamedSharding(mesh, kv_spec)),
                    length=jax.device_put(c.length,
                                          NamedSharding(mesh, P("data"))),
                )

            cache = _shard_cache(cache, spec)
            if draft_model is not None:
                draft_variables = shard_variables(draft_variables, mesh)
                d_cache = _shard_cache(d_cache, draft_spec)
        self.variables = variables
        self.cache = cache
        self.draft_variables = draft_variables
        self.draft_cache = d_cache
        self.free: List[int] = list(range(slots))
        self.active: Dict[int, dict] = {}
        self.sampling = sampling
        self._key = jax.random.key(seed)
        self._step_count = 0
        # optional models/prefix_cache.PrefixCache: shared prompt prefixes
        # are prefilled once; admissions copy the cached KV and prefill only
        # the remainder (see admit)
        self.prefix_cache = prefix_cache

        import functools

        @self._partitioned
        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(variables, tokens, cache, keep, key):
            logits, new_cache = model.apply(variables, tokens, cache, qp)
            # idle slots run the step too (fixed-shape SPMD program) but must
            # not advance: their cache writes land at their frozen length and
            # are dead data (re-admission prefills from position 0), so only
            # ``length`` needs masking. Keeping the mask inside the jit lets
            # the cache buffer be donated — the decode step updates the KV
            # cache in place instead of copying it.
            t = tokens.shape[1]
            length = jnp.where(keep, new_cache.length, new_cache.length - t)
            new_cache = new_cache._replace(length=length)
            return sample_tokens(logits[:, -1, :], sampling, key), new_cache

        self._decode = decode_step
        if draft_model is not None:
            self._spec_step = self._build_spec_step()
        self._prefill_cache = {}

    def _partitioned(self, fn):
        """Run (and therefore TRACE) ``fn`` under ``partitioned_kernels``
        when this batcher has a mesh, so the packed/int4 Pallas kernels
        tensor-parallelize via shard_map instead of being gathered and
        replicated per chip (parallel/shard_kernels.py). The contextvar is
        a trace-time switch: it must be active on the first CALL (when jit
        traces), not at definition."""
        if self.mesh is None:
            return fn
        from ..parallel.shard_kernels import partitioned_kernels

        def wrapped(*a, **k):
            with partitioned_kernels(self.mesh):
                return fn(*a, **k)

        return wrapped

    def _build_spec_step(self):
        """Compile the batched speculative round: a fixed-(k+1)-step draft
        scan over ALL slots plus one (slots, k+1)-token target verify, with
        per-slot accept/rollback inside the jit (VERDICT r4 next #3). The
        per-slot semantics are exactly ``SpeculativeDecoder``'s
        (models/speculative.py): greedy = longest-matching-prefix (output
        token-identical to the target's own greedy decode), stochastic =
        vmapped :func:`~.speculative.spec_accept` (exact target ancestral
        sampling per slot). The draft scan runs k+1 steps so the last
        proposal's KV is written (fully-accepted rounds would otherwise
        attend an all-zero row later)."""
        import functools

        from .speculative import batched_spec_round

        model, qp, sampling = self.model, self.qp, self.sampling
        draft_model, draft_qp = self.draft, self.draft_qp
        k_ = self.spec_k

        @self._partitioned
        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def spec_step(tvars, dvars, t_cache, d_cache, tokens_cur, keep, key):
            emitted, m, t_cache, d_cache = batched_spec_round(
                draft_model, dvars, d_cache, draft_qp,
                lambda toks: model.apply(tvars, toks, t_cache, qp),
                tokens_cur, k_, sampling, key)
            # per-slot rollback inside the jit: live slots advance to their
            # accepted frontier (+m+1 of the k+1 writes); idle slots undo
            # everything. Rejected/undone positions are dead data past
            # ``length`` — the same masking trick as idle-slot decode writes
            lt = t_cache.length - (k_ + 1) + jnp.where(keep, m + 1, 0)
            ld = d_cache.length - (k_ + 1) + jnp.where(keep, m + 1, 0)
            return (emitted, m, t_cache._replace(length=lt),
                    d_cache._replace(length=ld))

        return spec_step

    def _next_key(self):
        self._step_count += 1
        return jax.random.fold_in(self._key, self._step_count)

    def _prefill_fn(self, t_pad: int, draft: bool = False):
        key_ = ("prefill", t_pad, draft)
        if key_ not in self._prefill_cache:
            model = self.draft if draft else self.model
            qp = self.draft_qp if draft else self.qp
            sampling = self.sampling

            @jax.jit
            def prefill(variables, tokens, k, v, real_len, key):
                sub = KVCache(k=k, v=v, length=jnp.zeros((1,), jnp.int32))
                # chunk_attention: empty-cache prefill attends over the
                # prompt chunk only, not the padded max_seq slab
                logits, sub = model.apply(variables, tokens, sub, qp,
                                          chunk_attention=True)
                next_tok = sample_tokens(logits[:1, real_len - 1, :],
                                         sampling, key)[0]
                return next_tok, sub.k, sub.v

            self._prefill_cache[key_] = self._partitioned(prefill)
        return self._prefill_cache[key_]

    def _resume_admit_fn(self, t_pad: int):
        """Warm admission as ONE jitted call: slot slice + prefix splice +
        remainder prefill (cache-attention path). Fusing matters on the
        tunneled device, where each eager dispatch costs ~29 ms — split into
        separate slice/splice/prefill dispatches the warm path was SLOWER
        than cold prefill despite doing far less compute.

        The prefix length is read from ``k_pref.shape[2]`` instead of being
        baked into the closure, so compile-cache growth is bounded by the
        distinct (t_pad, bucket-aligned prefix length) pairs jit itself
        specializes on — lookup() only returns bucket multiples."""
        key = ("resume", t_pad)
        if key not in self._prefill_cache:
            model, qp, sampling = self.model, self.qp, self.sampling

            @jax.jit
            def admit(variables, ck, cv, slot, tokens, k_pref, v_pref,
                      real_len, rkey):
                lp = k_pref.shape[2]
                k_slot = jax.lax.dynamic_slice_in_dim(ck, slot, 1, axis=1)
                v_slot = jax.lax.dynamic_slice_in_dim(cv, slot, 1, axis=1)
                k_slot = jax.lax.dynamic_update_slice(k_slot, k_pref,
                                                      (0, 0, 0, 0, 0))
                v_slot = jax.lax.dynamic_update_slice(v_slot, v_pref,
                                                      (0, 0, 0, 0, 0))
                sub = KVCache(k=k_slot, v=v_slot,
                              length=jnp.full((1,), lp, jnp.int32))
                logits, sub = model.apply(variables, tokens, sub, qp)
                next_tok = sample_tokens(logits[:1, real_len - 1, :],
                                         sampling, rkey)[0]
                return next_tok, sub.k, sub.v

            self._prefill_cache[key] = self._partitioned(admit)
        return self._prefill_cache[key]

    def admit(self, prompt: List[int], max_new_tokens: int = 32) -> int:
        """Prefill a prompt into a free slot; returns the slot id.

        With a ``prefix_cache``, the longest cached prefix's KV is copied
        into the slot and only the remainder tokens are prefilled (value-
        identical: prefix KV depends only on prefix tokens, and the cache-
        attention path matches the chunk path bitwise)."""
        if not self.free:
            raise RuntimeError("no free slots")
        real = len(prompt)
        if _pad_to_bucket(real) > self.max_seq:
            raise ValueError(
                f"prompt of {real} tokens pads past max_seq={self.max_seq}")
        slot = self.free.pop(0)

        pref = self.prefix_cache.lookup(prompt) if self.prefix_cache else None
        if pref is not None and (
            pref[0] + _pad_to_bucket(real - pref[0]) > self.max_seq
        ):
            # the padded remainder chunk would spill past the slab end; the
            # dynamic_update_slice start clamp would then smear pad garbage
            # over the tail of the valid prefix KV — take the cold path
            pref = None
        if pref is not None:
            lp, k_pref, v_pref = pref
            rem = prompt[lp:]
            t_pad = _pad_to_bucket(len(rem))
            tokens = np.zeros((1, t_pad), np.int32)
            tokens[0, : len(rem)] = rem
            next_tok, k_new, v_new = self._resume_admit_fn(t_pad)(
                self.variables, self.cache.k, self.cache.v,
                jnp.asarray(slot), jnp.asarray(tokens), k_pref, v_pref,
                jnp.asarray(len(rem)), self._next_key(),
            )
        else:
            t_pad = _pad_to_bucket(real)
            tokens = np.zeros((1, t_pad), np.int32)
            tokens[0, :real] = prompt
            k_slot = jax.lax.dynamic_slice_in_dim(self.cache.k, slot, 1,
                                                  axis=1)
            v_slot = jax.lax.dynamic_slice_in_dim(self.cache.v, slot, 1,
                                                  axis=1)
            next_tok, k_new, v_new = self._prefill_fn(t_pad)(
                self.variables, jnp.asarray(tokens), k_slot, v_slot,
                jnp.asarray(real), self._next_key(),
            )

        if self.prefix_cache is not None:
            self.prefix_cache.store(prompt, k_new, v_new)
        self.cache = KVCache(
            k=jax.lax.dynamic_update_slice_in_dim(self.cache.k, k_new, slot,
                                                  axis=1),
            v=jax.lax.dynamic_update_slice_in_dim(self.cache.v, v_new, slot,
                                                  axis=1),
            length=self.cache.length.at[slot].set(real),
        )
        if self.draft is not None:
            # draft cache admission: always a cold full-prompt prefill of
            # the draft model into the parallel slot slab (the prefix cache
            # holds TARGET KV only; the draft is small — its prefill is the
            # cheap one). Invariant matches the target's: the draft cache
            # holds KV for prompt + generated[:-1]
            t_pad_d = _pad_to_bucket(real)
            toks_d = np.zeros((1, t_pad_d), np.int32)
            toks_d[0, :real] = prompt
            dk = jax.lax.dynamic_slice_in_dim(self.draft_cache.k, slot, 1,
                                              axis=1)
            dv = jax.lax.dynamic_slice_in_dim(self.draft_cache.v, slot, 1,
                                              axis=1)
            _, dk_new, dv_new = self._prefill_fn(t_pad_d, draft=True)(
                self.draft_variables, jnp.asarray(toks_d), dk, dv,
                jnp.asarray(real), self._next_key(),
            )
            self.draft_cache = KVCache(
                k=jax.lax.dynamic_update_slice_in_dim(
                    self.draft_cache.k, dk_new, slot, axis=1),
                v=jax.lax.dynamic_update_slice_in_dim(
                    self.draft_cache.v, dv_new, slot, axis=1),
                length=self.draft_cache.length.at[slot].set(real),
            )

        first = int(next_tok)
        self.active[slot] = {
            "generated": [first],
            "remaining": max_new_tokens - 1,
            "plen": real,
            "done": first == self.eos_token or max_new_tokens <= 1,
        }
        return slot

    def step(self) -> Dict[int, int]:
        """One batched decode step for every active unfinished slot.

        With a draft model configured this is a batched SPECULATIVE round:
        each live slot advances by 1..spec_k+1 tokens (the returned dict
        maps slot -> last emitted token). Slots whose cache cannot hold a
        full k+1-token round are finished early (within spec_k+1 tokens of
        ``max_seq`` — the non-speculative path cuts at max_seq-1)."""
        if self.draft is not None:
            return self._step_speculative()
        live = [s for s, st in self.active.items() if not st["done"]]
        if not live:
            return {}
        # feed each slot its last generated token; idle slots get token 0 and
        # their cache writes are at their frozen length (harmless: their
        # length is not advanced back — see below)
        tokens = np.zeros((self.slots, 1), np.int32)
        for s in live:
            tokens[s, 0] = self.active[s]["generated"][-1]

        keep = np.zeros((self.slots,), bool)
        keep[live] = True
        next_tokens, self.cache = self._decode(
            self.variables, jnp.asarray(tokens), self.cache,
            jnp.asarray(keep), self._next_key(),
        )

        out: Dict[int, int] = {}
        nt = np.asarray(next_tokens)
        for s in live:
            tok = int(nt[s])
            st = self.active[s]
            st["generated"].append(tok)
            st["remaining"] -= 1
            out[s] = tok
            if tok == self.eos_token or st["remaining"] <= 0 or (
                int(self.cache.length[s]) >= self.max_seq - 1
            ):
                st["done"] = True
        return out

    def _step_speculative(self) -> Dict[int, int]:
        """One batched speculative round (see :meth:`step`)."""
        k = self.spec_k
        live = []
        for s, st in self.active.items():
            if st["done"]:
                continue
            if st["plen"] + len(st["generated"]) + k + 1 > self.max_seq:
                # no room for a full k+1-token round in the cache slab
                st["done"] = True
                continue
            live.append(s)
        if not live:
            return {}
        tokens = np.zeros((self.slots,), np.int32)
        for s in live:
            tokens[s] = self.active[s]["generated"][-1]
        keep = np.zeros((self.slots,), bool)
        keep[live] = True

        emitted, m, self.cache, self.draft_cache = self._spec_step(
            self.variables, self.draft_variables, self.cache,
            self.draft_cache, jnp.asarray(tokens), jnp.asarray(keep),
            self._next_key(),
        )
        em = np.asarray(emitted)
        mm = np.asarray(m)

        out: Dict[int, int] = {}
        for s in live:
            st = self.active[s]
            acc = int(mm[s])
            self.proposed += k
            self.accepted += acc
            for tok in em[s][: acc + 1].tolist():
                tok = int(tok)
                st["generated"].append(tok)
                st["remaining"] -= 1
                out[s] = tok
                if tok == self.eos_token or st["remaining"] <= 0:
                    # truncated mid-round: the slot is done, so the cache
                    # frontier past the kept tokens is dead data
                    st["done"] = True
                    break
        return out

    @property
    def acceptance_rate(self) -> float:
        """Draft-token acceptance across all speculative rounds so far."""
        return self.accepted / max(self.proposed, 1)

    def retire(self, slot: int) -> List[int]:
        """Free a finished slot; returns its generated tokens."""
        st = self.active.pop(slot)
        self.cache = KVCache(
            k=self.cache.k, v=self.cache.v,
            length=self.cache.length.at[slot].set(0),
        )
        if self.draft_cache is not None:
            self.draft_cache = self.draft_cache._replace(
                length=self.draft_cache.length.at[slot].set(0))
        self.free.append(slot)
        return st["generated"]

    def run_to_completion(self, max_steps: int = 1000) -> None:
        for _ in range(max_steps):
            if not self.step():
                return
