"""Speculative decoding: draft-and-verify generation for the quantized Llama.

Green-field serving capability (the reference has no generation path). A
small draft model proposes ``k`` greedy tokens; the target verifies all of
them in ONE forward (prefill-shaped, MXU-efficient) and accepts the longest
matching prefix plus its own correction token — so each target forward
yields between 1 and k+1 tokens while the output stays **exactly** the
target's greedy decode (tested: any draft, even a random one, produces
token-identical output; only the step count changes).

TPU-native shape discipline: the draft's k proposals run as a fixed-k
``lax.scan`` of single-token decodes, the verify is a fixed ``k+1``-token
forward, and rejection never rewrites cache contents — positions beyond the
accepted length are dead by the ``length`` masking and are overwritten by
later writes (the same trick the continuous batchers use for idle slots).
Host control flow touches one scalar (the accept count) per iteration.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..quant.sites import FIXED, QuantPhase
from .llama import KVCache, LlamaSpec


class SpecStats(NamedTuple):
    proposed: int       # draft tokens proposed
    accepted: int       # draft tokens accepted by the target
    target_steps: int   # target forwards executed

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.proposed, 1)


class SpeculativeDecoder:
    """Greedy speculative decoding over (target, draft) quantized models."""

    def __init__(self, model, variables, spec: LlamaSpec,
                 draft_model, draft_variables, draft_spec: LlamaSpec, *,
                 k: int = 4, max_seq: Optional[int] = None,
                 qp: QuantPhase = FIXED, draft_qp: Optional[QuantPhase] = None,
                 eos_token: int = -1):
        self.model, self.variables, self.spec = model, variables, spec
        self.draft = draft_model
        self.draft_variables = draft_variables
        self.draft_spec = draft_spec
        self.k = k
        self.max_seq = max_seq or min(spec.max_seq_len,
                                      draft_spec.max_seq_len)
        self.qp = qp
        self.draft_qp = draft_qp or qp
        self.eos_token = eos_token

        k_ = k
        draft_qp_ = self.draft_qp

        @jax.jit
        def draft_propose(dvars, cache, t_cur):
            """k greedy draft proposals as a fixed-(k+1)-step scan.

            The scan feeds t_cur, d1, ..., dk — one step MORE than needed
            for the proposals — so that d_k's KV is also written: on a fully
            accepted round the rollback marks d_k's position valid, and
            without this feed the draft would attend an all-zero row there
            on every later proposal (silently degrading acceptance)."""
            def step(carry, _):
                cache, tok = carry
                logits, cache = draft_model.apply(dvars, tok[None, None],
                                                  cache, draft_qp_)
                nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
                return (cache, nxt), nxt

            (cache, _), outs = lax.scan(step, (cache, t_cur), None,
                                        length=k_ + 1)
            return outs[:k_], cache

        @jax.jit
        def verify(tvars, cache, t_cur, drafts):
            """One (k+1)-token target forward; longest-prefix acceptance."""
            tokens = jnp.concatenate([t_cur[None], drafts])[None, :]
            logits, cache = model.apply(tvars, tokens, cache, qp)
            greedy = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (k+1,)
            # drafts[i] is accepted iff all drafts[:i] matched and
            # drafts[i] == greedy[i]
            match = drafts == greedy[:-1]
            m = jnp.argmin(jnp.concatenate(
                [match, jnp.zeros((1,), bool)]).astype(jnp.int32))
            # emitted tokens: drafts[:m] then the correction greedy[m]
            out = jnp.where(jnp.arange(k_ + 1) < m,
                            jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)]),
                            jnp.broadcast_to(greedy[m], (k_ + 1,)))
            return out, m, cache

        self._propose = draft_propose
        self._verify = verify
        self._prefill_jit = {}

    def _prefill(self, model, variables, spec, qp, prompt):
        """Jitted bucket-padded prefill (right padding is causally inert)."""
        real = len(prompt)
        t_pad = max(8, -(-real // 8) * 8)
        key = (id(model), t_pad)
        if key not in self._prefill_jit:
            @jax.jit
            def prefill(variables, tokens, cache, real_len):
                logits, cache = model.apply(variables, tokens, cache, qp,
                                            chunk_attention=True)
                return (jnp.argmax(logits[0, real_len - 1]).astype(jnp.int32),
                        cache)

            self._prefill_jit[key] = prefill
        cache = KVCache.zeros(
            spec, 1, self.max_seq,
            dtype=jnp.uint8 if getattr(model, "packed_kv", False)
            else jnp.bfloat16)
        toks = np.zeros((1, t_pad), np.int32)
        toks[0, :real] = prompt
        t_cur, cache = self._prefill_jit[key](
            variables, jnp.asarray(toks), cache, jnp.asarray(real))
        # padded positions wrote dead data past ``real``; mask via length
        return t_cur, cache._replace(
            length=jnp.full_like(cache.length, real))

    def generate(self, prompt: List[int], max_new_tokens: int = 32
                 ) -> Tuple[List[int], SpecStats]:
        """Greedy-decode ``max_new_tokens`` tokens after ``prompt``.

        Returns (tokens, stats); tokens are exactly the target model's own
        greedy continuation.
        """
        t_cur, t_cache = self._prefill(self.model, self.variables, self.spec,
                                       self.qp, prompt)
        _, d_cache = self._prefill(self.draft, self.draft_variables,
                                   self.draft_spec, self.draft_qp, prompt)
        p = len(prompt)
        out: List[int] = [int(t_cur)]
        proposed = accepted = steps = 0

        while (len(out) < max_new_tokens and out[-1] != self.eos_token
               and p + len(out) + self.k + 1 < self.max_seq):
            drafts, d_cache = self._propose(self.draft_variables, d_cache,
                                            t_cur)
            emitted, m, t_cache = self._verify(self.variables, t_cache, t_cur,
                                               drafts)
            m = int(m)
            steps += 1
            proposed += self.k
            accepted += m
            new = np.asarray(emitted)[: m + 1].tolist()
            # truncate to the token budget and stop at EOS
            for tok in new:
                out.append(int(tok))
                if int(tok) == self.eos_token or len(out) >= max_new_tokens:
                    break
            # roll both caches back to the accepted frontier: the cache must
            # hold exactly prompt + out[:-1] (the head token out[-1] is fed
            # next); rejected draft positions become dead data beyond
            # ``length`` and are overwritten by later writes
            valid = p + len(out)
            t_cache = t_cache._replace(
                length=jnp.full_like(t_cache.length, valid - 1))
            d_cache = d_cache._replace(
                length=jnp.full_like(d_cache.length, valid - 1))
            t_cur = jnp.asarray(out[-1], jnp.int32)

        return out[:max_new_tokens], SpecStats(proposed, accepted, steps)
