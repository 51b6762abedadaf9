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
from .sampling import GREEDY, SamplingParams, filtered_probs


def spec_accept(drafts, q_rows, p_rows, u, key):
    """Stochastic speculative accept/reject (Leviathan et al. 2023 /
    Chen et al. 2023) as a pure, fixed-shape function.

    drafts: (k,) int32 tokens sampled from the draft distributions q_rows
    ((k, V) rows, already filtered+normalized); p_rows: (k+1, V) target
    distributions at the same positions (row k is the bonus position after
    all drafts); u: (k,) uniforms; key: PRNG for the residual draw.

    Draft i is accepted with probability min(1, p_i(x_i)/q_i(x_i)) given all
    earlier drafts accepted. On the first rejection at m the replacement is
    drawn from the residual norm(max(p_m - q_m, 0)); with all k accepted the
    bonus token is drawn from p_k. The emitted prefix is then an EXACT sample
    from ancestral target sampling (proof: per-token output law =
    q·min(1,p/q) + (1-alpha)·norm((p-q)+) = p, tested by Monte Carlo).

    Returns (out (k+1,), m) where out[:m] = accepted drafts, out[m] = the
    resampled/bonus token, and out[m+1:] is broadcast filler.
    """
    k = drafts.shape[0]
    idx = jnp.arange(k)
    q_x = q_rows[idx, drafts]
    p_x = p_rows[idx, drafts]
    acc = u < jnp.minimum(p_x / jnp.maximum(q_x, 1e-30), 1.0)
    m = jnp.argmin(jnp.concatenate(
        [acc, jnp.zeros((1,), bool)]).astype(jnp.int32))
    # residual at the rejection point; bonus distribution when m == k
    p_m = p_rows[m]
    q_m = q_rows[jnp.minimum(m, k - 1)]
    resid = jnp.where(m < k, jnp.maximum(p_m - q_m, 0.0), p_m)
    norm = jnp.sum(resid)
    # a zero residual after a rejection has probability 0 (it requires
    # p <= q pointwise, which makes the acceptance ratio 1); guard the
    # numerics by falling back to p_m
    resid = jnp.where(norm > 1e-30, resid / jnp.maximum(norm, 1e-30), p_m)
    y = jax.random.categorical(key, jnp.log(jnp.maximum(resid, 1e-30)))
    out = jnp.where(jnp.arange(k + 1) < m,
                    jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)]),
                    jnp.broadcast_to(y.astype(jnp.int32), (k + 1,)))
    return out, m


def batched_spec_round(draft_model, dvars, d_cache, draft_qp, target_apply,
                       tokens_cur, k, sampling, key):
    """The batched speculative round shared by the continuous batchers:
    a fixed-(k+1)-step draft scan over ALL slots plus ONE (B, k+1)-token
    target verify with per-slot acceptance (VERDICT r4 next #3).

    ``target_apply``: ``(tokens (B, k+1)) -> (logits, new_target_cache)`` —
    the caller closes over the target model/variables/cache, so the same
    core serves the dense-slab ``ContinuousBatcher`` and the page-table
    ``PagedBatcher`` (rollback semantics differ per cache type and stay
    with the caller). Greedy sampling emits the longest matching prefix
    plus the target's correction (token-identical to the target's own
    greedy decode); stochastic sampling is vmapped :func:`spec_accept`
    (exact target ancestral sampling per slot). The draft scan runs k+1
    steps so the last proposal's KV is written (fully-accepted rounds
    would otherwise attend an all-zero row later).

    Returns ``(emitted (B, k+1), m (B,), t_cache, d_cache)`` where slot
    ``b`` emits ``emitted[b, :m[b]+1]``; both caches come back with their
    lengths advanced by the full k+1 writes — the caller applies the
    accept-frontier rollback.
    """
    b = tokens_cur.shape[0]
    stochastic = not sampling.greedy
    kd, kv = jax.random.split(key)
    dkeys = jax.random.split(kd, k + 1)

    def dstep(carry, skey):
        cache, tok = carry
        logits, cache = draft_model.apply(dvars, tok[:, None], cache,
                                          draft_qp)
        row = logits[:, -1, :]
        if stochastic:
            q_row = filtered_probs(row, sampling)
            nxt = jax.random.categorical(
                skey, jnp.log(jnp.maximum(q_row, 1e-30)), axis=-1
            ).astype(jnp.int32)
        else:
            q_row = jnp.zeros((b, 0), jnp.float32)
            nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
        return (cache, nxt), (nxt, q_row)

    (d_cache, _), (toks, q_rows) = lax.scan(dstep, (d_cache, tokens_cur),
                                            dkeys)
    drafts = toks[:k].T                                       # (B, k)

    tokens = jnp.concatenate([tokens_cur[:, None], drafts], axis=1)
    logits, t_cache = target_apply(tokens)

    if stochastic:
        p_rows = filtered_probs(logits, sampling)             # (B, k+1, V)
        q_bkv = jnp.moveaxis(q_rows[:k], 0, 1)                # (B, k, V)
        ku, kr = jax.random.split(kv)
        u = jax.random.uniform(ku, (b, k))
        rkeys = jax.random.split(kr, b)
        emitted, m = jax.vmap(spec_accept)(drafts, q_bkv, p_rows, u, rkeys)
    else:
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        match = drafts == greedy[:, :-1]
        m = jnp.argmin(jnp.concatenate(
            [match, jnp.zeros((b, 1), bool)],
            axis=1).astype(jnp.int32), axis=1)
        corr = jnp.take_along_axis(greedy, m[:, None], axis=1)
        emitted = jnp.where(
            jnp.arange(k + 1)[None, :] < m[:, None],
            jnp.concatenate([drafts, jnp.zeros((b, 1), jnp.int32)], axis=1),
            corr)
    return emitted, m, t_cache, d_cache


class SpecStats(NamedTuple):
    proposed: int       # draft tokens proposed
    accepted: int       # draft tokens accepted by the target
    target_steps: int   # target forwards executed

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.proposed, 1)


class SpeculativeDecoder:
    """Speculative decoding over (target, draft) quantized models.

    ``sampling=GREEDY`` (default): greedy draft + longest-matching-prefix
    verification — output token-identical to the target's greedy decode.
    With ``temperature > 0``: stochastic draft proposals + accept/reject
    verification (:func:`spec_accept`) whose output is distributed EXACTLY
    as ancestral sampling from the target's filtered distribution — the mode
    serving actually uses with temperature/top-k/top-p. Both compose with
    packed (uint8) KV caches.
    """

    def __init__(self, model, variables, spec: LlamaSpec,
                 draft_model, draft_variables, draft_spec: LlamaSpec, *,
                 k: int = 4, max_seq: Optional[int] = None,
                 qp: QuantPhase = FIXED, draft_qp: Optional[QuantPhase] = None,
                 eos_token: int = -1, sampling: SamplingParams = GREEDY,
                 seed: int = 0, mesh=None):
        """``mesh``: optional (data, model) ``jax.sharding.Mesh`` — target
        and draft variables shard per ``parallel.sharding`` rules and every
        jitted step traces under ``partitioned_kernels`` so packed/int4
        weight kernels tensor-parallelize (same convenience the
        ``ContinuousBatcher`` offers)."""
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import shard_variables

            variables = shard_variables(variables, mesh)
            draft_variables = shard_variables(draft_variables, mesh)
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
        self.sampling = sampling
        self._key = jax.random.key(seed)
        self._nkeys = 0

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

        sampling_ = sampling

        @jax.jit
        def draft_propose_stochastic(dvars, cache, t_cur, key):
            """k stochastic proposals: step i samples x_i from the draft's
            filtered distribution q_i and records the full q_i row (the
            verifier's accept ratios and residuals need the distribution,
            not just the sample). Same k+1-step KV discipline as greedy."""
            keys = jax.random.split(key, k_ + 1)

            def step(carry, skey):
                cache, tok = carry
                logits, cache = draft_model.apply(dvars, tok[None, None],
                                                  cache, draft_qp_)
                q_row = filtered_probs(logits[0, -1], sampling_)
                nxt = jax.random.categorical(
                    skey, jnp.log(jnp.maximum(q_row, 1e-30))).astype(jnp.int32)
                return (cache, nxt), (nxt, q_row)

            (cache, _), (toks, q_rows) = lax.scan(step, (cache, t_cur), keys)
            return toks[:k_], q_rows[:k_], cache

        @jax.jit
        def verify_stochastic(tvars, cache, t_cur, drafts, q_rows, key):
            """One (k+1)-token target forward + spec_accept."""
            tokens = jnp.concatenate([t_cur[None], drafts])[None, :]
            logits, cache = model.apply(tvars, tokens, cache, qp)
            p_rows = filtered_probs(logits[0], sampling_)  # (k+1, V)
            ku, kr = jax.random.split(key)
            u = jax.random.uniform(ku, (k_,))
            out, m = spec_accept(drafts, q_rows, p_rows, u, kr)
            return out, m, cache

        def _partitioned(fn):
            # trace-time context (see serving.ContinuousBatcher._partitioned)
            if mesh is None:
                return fn
            from ..parallel.shard_kernels import partitioned_kernels

            def wrapped(*a, **kw):
                with partitioned_kernels(mesh):
                    return fn(*a, **kw)

            return wrapped

        self._propose = _partitioned(draft_propose)
        self._verify = _partitioned(verify)
        self._propose_stochastic = _partitioned(draft_propose_stochastic)
        self._verify_stochastic = _partitioned(verify_stochastic)
        self._prefill_jit = {}

    def _next_key(self):
        self._nkeys += 1
        return jax.random.fold_in(self._key, self._nkeys)

    def _prefill(self, model, variables, spec, qp, prompt, sample_key=None):
        """Jitted bucket-padded prefill (right padding is causally inert).

        ``sample_key``: sample the first new token from the target's filtered
        distribution instead of argmax (stochastic mode; the draft prefill's
        token is discarded, so only the target passes a key)."""
        from .sampling import sample_tokens

        real = len(prompt)
        t_pad = max(8, -(-real // 8) * 8)
        stochastic = sample_key is not None
        key = (id(model), t_pad, stochastic)
        if key not in self._prefill_jit:
            sampling = self.sampling

            @jax.jit
            def prefill(variables, tokens, cache, real_len, skey):
                logits, cache = model.apply(variables, tokens, cache, qp,
                                            chunk_attention=True)
                row = logits[0, real_len - 1]
                if stochastic:
                    tok = sample_tokens(row[None], sampling, skey)[0]
                else:
                    tok = jnp.argmax(row).astype(jnp.int32)
                return tok, cache

            if self.mesh is not None:
                from ..parallel.shard_kernels import partitioned_kernels

                inner = prefill
                mesh = self.mesh

                def prefill(*a, _inner=inner, _mesh=mesh):
                    with partitioned_kernels(_mesh):
                        return _inner(*a)

            self._prefill_jit[key] = prefill
        cache = KVCache.zeros(
            spec, 1, self.max_seq,
            dtype=jnp.uint8 if getattr(model, "packed_kv", False)
            else jnp.bfloat16)
        toks = np.zeros((1, t_pad), np.int32)
        toks[0, :real] = prompt
        t_cur, cache = self._prefill_jit[key](
            variables, jnp.asarray(toks), cache, jnp.asarray(real),
            sample_key if stochastic else self._key)
        # padded positions wrote dead data past ``real``; mask via length
        return t_cur, cache._replace(
            length=jnp.full_like(cache.length, real))

    def generate(self, prompt: List[int], max_new_tokens: int = 32
                 ) -> Tuple[List[int], SpecStats]:
        """Decode ``max_new_tokens`` tokens after ``prompt``.

        Returns (tokens, stats). Greedy sampling params: tokens are exactly
        the target model's own greedy continuation. Stochastic params:
        tokens are an exact sample from the target's ancestral sampling
        distribution (regardless of the draft).
        """
        stochastic = not self.sampling.greedy
        t_cur, t_cache = self._prefill(
            self.model, self.variables, self.spec, self.qp, prompt,
            sample_key=self._next_key() if stochastic else None)
        _, d_cache = self._prefill(self.draft, self.draft_variables,
                                   self.draft_spec, self.draft_qp, prompt)
        p = len(prompt)
        out: List[int] = [int(t_cur)]
        proposed = accepted = steps = 0

        while (len(out) < max_new_tokens and out[-1] != self.eos_token
               and p + len(out) + self.k + 1 < self.max_seq):
            if stochastic:
                drafts, q_rows, d_cache = self._propose_stochastic(
                    self.draft_variables, d_cache, t_cur, self._next_key())
                emitted, m, t_cache = self._verify_stochastic(
                    self.variables, t_cache, t_cur, drafts, q_rows,
                    self._next_key())
            else:
                drafts, d_cache = self._propose(self.draft_variables, d_cache,
                                                t_cur)
                emitted, m, t_cache = self._verify(self.variables, t_cache,
                                                   t_cur, drafts)
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
