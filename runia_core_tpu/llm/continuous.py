"""Continuous (in-flight) batching decode engine.

Production LLM serving decodes many requests of different lengths at once;
a static batch (``GenerationService``) makes late arrivals wait for the
whole batch and finished sequences idle until the longest one ends. This
engine keeps a FIXED number of decode slots hot: every device step decodes
one token for all slots, and whenever a slot finishes (EOS or token budget)
it is refilled from the queue by prefilling the new prompt into that slot's
region of the shared KV cache — the Orca/vLLM scheduling model, built
TPU-first:

  - one shared (S, max_ctx) KV cache; per-slot write offsets ride the
    vector ``cache_index`` path of ``LlamaLM`` (each slot has its own
    physical clock, no re-padding or cache shuffling on refill);
  - decode runs in jitted ``lax.scan`` CHUNKS of ``chunk_tokens`` steps
    between host syncs — over a tunneled TPU a per-step sync (~30 ms)
    would dominate, so a finished slot idles at most chunk-1 steps before
    the host notices and refills it;
  - prefill is its own jitted program per bucketed prompt length, writing
    the slot row of every cache buffer in place (donated argument) and
    refreshing that slot's next-token logits;
  - ``prefill_chunk=C`` switches to chunked prefill (the vLLM scheduling
    refinement): prompts advance in fixed C-token chunks interleaved with
    decode chunks, so admitting a long prompt stalls in-flight decodes by
    at most one chunk — and exactly ONE prefill shape is ever compiled
    (the bucketed path compiles one per prompt-length bucket, 30-60 s each
    over a tunneled TPU);
  - ``prefix_cache=True`` (with chunked prefill) adds automatic prefix
    caching: an admission sharing a chunk-aligned prompt prefix with a
    resident slot copies that slot's KV row (one static-shape program) and
    prefills only the suffix — system-prompt-heavy traffic skips most of
    its prefill FLOPs, exactly;
  - ``draft_model=`` adds per-slot speculative decoding: gamma draft
    proposals per slot, ONE (S, gamma+1) target verify forward, per-slot
    acceptance on the vector clocks, correction deferred through
    ``step_logits`` — greedy token-identical to the plain engine at
    n_acc+1 tokens per target forward;
  - slot state (positions, pad offsets, active flags) lives on device;
    the host only sees the per-chunk (K, S) token/log-prob block.

No reference counterpart (the reference's LLM path is one blocking HF
``generate`` per call — reference llm_uncertainty/scores.py:429-524); this
is the serving-throughput story for the TPU rebuild.
"""

from __future__ import annotations

import time
import warnings
from collections import deque
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.models.transformer import init_cache

__all__ = ["ContinuousBatchingEngine"]


# Compiled-program sharing across engine instances: every device program
# an engine builds is a pure function of hashable configuration (the flax
# module, capacity scalars, decode flags), so two engines with the same
# configuration — a fresh engine per batch, a test matrix, the
# UncertaintyServer pair — reuse ONE jitted callable (and therefore one
# XLA compile per shape, 30-60 s each over a tunneled TPU).
#
# LRU-BOUNDED like llm/generate.py's cache (see the note there): pinning
# every program forever keeps its loaded XLA executable alive, and a long
# test session accumulating hundreds of live CPU executables reproducibly
# segfaulted XLA's next compile. Live engines hold their own references
# (self._chunk_fn etc.), so eviction never invalidates an in-use program.
from collections import OrderedDict as _OrderedDict

_PROGRAM_CACHE: "_OrderedDict[tuple, Any]" = _OrderedDict()
_PROGRAM_CACHE_MAX = 96


def _cached_program(key: tuple, builder):
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        fn = builder()
        _PROGRAM_CACHE[key] = fn
    _PROGRAM_CACHE.move_to_end(key)
    while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
        _PROGRAM_CACHE.popitem(last=False)
    return fn


def _vocab_norm_entropy(log_soft: jnp.ndarray) -> jnp.ndarray:
    """Vocab-normalized distribution entropy over the last axis — the
    per-token term of ``llm.scores.generation_entropy``. The isneginf
    guard keeps masked (-inf) logits from producing 0 * -inf = nan."""
    terms = jnp.exp(log_soft) * jnp.where(
        jnp.isneginf(log_soft), 0.0, log_soft
    )
    return -jnp.sum(terms, axis=-1) / jnp.log(log_soft.shape[-1])


def _pack_harvest(toks, lps, ents, emitted, active, extra=None):
    """Flatten every host-bound per-chunk output into ONE f32 buffer.

    The scheduling loop must read these after every decode chunk; on a
    tunneled device each separate fetch pays a full round trip (~25 ms),
    so the chunk programs ship one buffer instead of five. Token ids ride
    as f32 — exact for any vocab below 2**24 (f32 integer range).
    ``extra`` appends a small trailer of counters (same f32 exactness
    argument) without costing a second fetch."""
    parts = [
        toks.astype(jnp.float32).ravel(),
        lps.astype(jnp.float32).ravel(),
        ents.astype(jnp.float32).ravel(),
        emitted.astype(jnp.float32).ravel(),
        active.astype(jnp.float32).ravel(),
    ]
    if extra is not None:
        parts.append(extra.astype(jnp.float32).ravel())
    return jnp.concatenate(parts)


def _unpack_harvest(packed: np.ndarray, shape, num_slots, n_extra=0):
    """Invert :func:`_pack_harvest` host-side: (toks, lps, ents, emitted,
    active, extra) with ``toks/lps/ents/emitted`` of ``shape``."""
    n = int(np.prod(shape))
    sec = [packed[i * n:(i + 1) * n].reshape(shape) for i in range(4)]
    active = packed[4 * n:4 * n + num_slots] > 0.5
    extra = packed[4 * n + num_slots:4 * n + num_slots + n_extra]
    return (sec[0].astype(np.int64), sec[1], sec[2], sec[3] > 0.5, active,
            extra)


def speculative_breakeven(cost_ratio: float, gamma: int,
                          overhead: float = 0.0) -> float:
    """Minimum per-token draft acceptance at which one speculative round
    beats plain decode, under the bandwidth-bound round model the engine
    actually executes: a round costs ``(gamma+1) * cost_ratio + 1 +
    overhead`` target steps (gamma+1 draft forwards, one verify forward,
    plus any measured per-round fixed cost in target-step units) and emits
    ``E(a) = (1 - a^(gamma+1)) / (1 - a)`` tokens at per-token acceptance
    ``a`` (accepted prefix + the always-emitted correction/bonus token).
    Solved by bisection; returns 1.0 when no acceptance can pay for the
    draft. The round-3 bench regression is the cautionary instance: the
    full-depth int8 self-draft (cost_ratio ~0.55, gamma 4) has an ideal
    floor of 0.856 and measured acceptance 0.866 — 1% of headroom, which
    the real per-round overhead consumed, shipping 0.87x of plain. A
    draft must clear this floor with MARGIN (or ``overhead`` must carry
    the measured fixed cost) for speculation to pay.
    """
    c, g = float(cost_ratio), int(gamma)
    cost = (g + 1) * c + 1.0 + float(overhead)

    def emitted(a):
        if a >= 1.0:
            return float(g + 1)
        return (1.0 - a ** (g + 1)) / (1.0 - a)

    if emitted(1.0) <= cost:
        return 1.0
    lo, hi = 0.0, 1.0
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if emitted(mid) < cost:
            lo = mid
        else:
            hi = mid
    return hi


def _make_spec_round(model, draft, gamma, eos, do_sample, temperature,
                     collect_rauq=False):
    """ONE speculative round, shared by the interactive ``_spec_chunk`` and
    the fused drain's spec branch (their greedy-token-identity contract
    rides this single copy of the math).

    Per round: select every slot's next token (greedy argmax of its
    ``step_logits`` row, or a draw from its ``samp_logp`` distribution),
    draft ``gamma`` proposals per slot (vector-clock draft cache; the extra
    (gamma+1)-th step exists purely to write the last proposal's K/V),
    verify the (S, gamma+1) block with ONE target forward, and compute the
    agreeing/accepted prefix. The correction token is DEFERRED: greedy
    carries the target's raw row at the rejection index forward (next
    round's argmax IS the correction — token-identical to the plain
    engine); sampled carries the Leviathan residual
    ``max(p_target - p_draft, 0)`` as the next round's sampling
    distribution, so every emitted token is an EXACT temperature sample of
    the target. Rejected rows leave stale K/V that the next round's writes
    cover before anything attends them (the row-ownership invariant).

    Returns a dict with the advanced carries (``cache``/``d_cache``/
    ``step_logits``/``samp_logp``/``slot_pos``/``active``) plus everything
    the caller's emission sink needs: the (S, gamma+1) ``block``/``lps``/
    ``ents``, the ``emit`` mask (EOS- and budget-truncated), per-slot
    ``take`` counts, accepted-proposal counts ``n_acc``, and the RAUQ
    ``att_prev`` gather (zeros unless ``collect_rauq``).
    """
    idxs = jnp.arange(gamma + 1)[None, :]

    def spec_round(params, dparams, cache, d_cache, step_logits, samp_logp,
                   slot_pos, active, limit, key):
        k0, kd, kr = jax.random.split(key, 3)
        log_soft = jax.nn.log_softmax(step_logits, axis=-1)
        if do_sample:
            tok0 = jax.random.categorical(
                k0, samp_logp, axis=-1
            ).astype(jnp.int32)
        else:
            tok0 = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        # Reported log-probs follow the engine contract: raw target
        # log-probability of the emitted token (not the sampling
        # distribution's).
        lp0 = jnp.take_along_axis(log_soft, tok0[:, None], axis=-1)[:, 0]
        ent0 = _vocab_norm_entropy(log_soft)

        def draft_step(carry2, kj):
            tok, dc, idx = carry2
            lg, _, _, dc = draft.apply(dparams, tok[:, None], dc, idx)
            if do_sample:
                row = lg[:, 0, :] / temperature
                nxt = jax.random.categorical(kj, row, axis=-1)
            else:
                # Greedy ignores temperature entirely (temp=0.0 is a
                # common greedy idiom; dividing would inf the row).
                row = lg[:, 0, :]
                nxt = jnp.argmax(row, axis=-1)
            nxt = nxt.astype(jnp.int32)
            return (nxt, dc, idx + 1), (nxt, jax.nn.softmax(row))

        (_, d_cache, _), (outs, dprob_x) = jax.lax.scan(
            draft_step, (tok0, d_cache, slot_pos),
            jax.random.split(kd, gamma + 1),
        )
        proposals = jnp.swapaxes(outs[:gamma], 0, 1)  # (S, gamma)
        draft_probs = jnp.swapaxes(dprob_x[:gamma], 0, 1)

        block = jnp.concatenate([tok0[:, None], proposals], axis=1)
        lg, v_attn, _, cache = model.apply(
            params, block, cache, slot_pos
        )  # (S, gamma+1, V), vector clocks
        if collect_rauq:
            # RAUQ signal from the verify forward: emission j's query sits
            # at clock+j and its previous position is clock+j-1 — a
            # per-(slot, j) column gather from the (L, S, H, gamma+1, kv)
            # attention stack.
            prev = jnp.maximum(
                slot_pos[:, None] + jnp.arange(gamma + 1)[None, :] - 1, 0
            )  # (S, gamma+1)
            att_prev = jnp.take_along_axis(
                v_attn, prev[None, :, None, :, None], axis=-1
            )[..., 0]  # (L, S, H, gamma+1)
        else:
            att_prev = jnp.zeros((), jnp.float32)
        logp = jax.nn.log_softmax(lg, axis=-1)
        if do_sample:
            # Leviathan rejection sampling, vectorized over slots: accept
            # proposal i with prob min(1, p_t/p_d); the residual at the
            # rejection row becomes the next round's sampling distribution
            # (deferred correction; the all-accepted bonus row has a zero
            # draft row, so its residual is the raw target distribution).
            t_probs = jax.nn.softmax(lg / temperature, axis=-1)
            p_t = jnp.take_along_axis(
                t_probs[:, :-1, :], proposals[..., None], axis=-1
            )[..., 0]
            p_d = jnp.take_along_axis(
                draft_probs, proposals[..., None], axis=-1
            )[..., 0]
            u = jax.random.uniform(kr, p_t.shape)
            accept = u < jnp.minimum(1.0, p_t / jnp.maximum(p_d, 1e-20))
            agree = jnp.cumprod(accept.astype(jnp.int32), axis=1)
            n_acc = jnp.sum(agree, axis=1)
            draft_ext = jnp.concatenate(
                [draft_probs, jnp.zeros_like(t_probs[:, :1, :])], axis=1
            )
            t_row = jnp.take_along_axis(
                t_probs, n_acc[:, None, None], axis=1
            )[:, 0, :]
            d_row = jnp.take_along_axis(
                draft_ext, n_acc[:, None, None], axis=1
            )[:, 0, :]
            residual = jnp.maximum(t_row - d_row, 0.0)
            residual = jnp.where(
                jnp.sum(residual, axis=-1, keepdims=True) > 0,
                residual, t_row,
            )
            samp_logp = jnp.where(
                active[:, None], jnp.log(residual + 1e-30), samp_logp
            )
        else:
            preds = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            agree = jnp.cumprod(
                (proposals == preds[:, :-1]).astype(jnp.int32), axis=1
            )
            n_acc = jnp.sum(agree, axis=1)  # (S,) accepted proposals

        # Emission vector = [tok0, p1..pg]; candidate count n_acc+1.
        lp_rest = jnp.take_along_axis(
            logp[:, :-1, :], proposals[..., None], axis=-1
        )[..., 0]
        lps = jnp.concatenate([lp0[:, None], lp_rest], axis=1)
        ent_rest = _vocab_norm_entropy(logp[:, :-1, :])
        ents = jnp.concatenate([ent0[:, None], ent_rest], axis=1)

        cand = n_acc + 1
        if eos is not None:
            in_r = idxs < cand[:, None]
            is_eos = (block == eos) & in_r
            has_eos = jnp.any(is_eos, axis=1)
            cand = jnp.where(has_eos, jnp.argmax(is_eos, axis=1) + 1, cand)
        emit = (
            active[:, None]
            & (idxs < cand[:, None])
            & ((slot_pos[:, None] + idxs) < limit[:, None])
        )
        take = jnp.sum(emit.astype(jnp.int32), axis=1)
        new_pos = slot_pos + take
        new_active = active & (new_pos < limit)
        if eos is not None:
            new_active = new_active & ~has_eos
        # Deferred correction: the target's row at the rejection index is
        # the next round's distribution.
        nxt_row = jnp.take_along_axis(
            lg, n_acc[:, None, None], axis=1
        )[:, 0, :]
        step_logits = jnp.where(active[:, None], nxt_row, step_logits)
        return dict(
            cache=cache, d_cache=d_cache, step_logits=step_logits,
            samp_logp=samp_logp, slot_pos=new_pos, active=new_active,
            block=block, lps=lps, ents=ents, emit=emit, take=take,
            n_acc=n_acc, att_prev=att_prev,
        )

    return spec_round


class ContinuousBatchingEngine:
    """Fixed-slot in-flight batching over a ``LlamaLM``-style model.

    Usage::

        eng = ContinuousBatchingEngine(model, params, num_slots=8,
                                       max_ctx=256, max_new_tokens=32)
        results = eng.generate_all(prompts)   # any number of prompts

    Each result dict carries ``tokens`` (generated ids, EOS-stripped),
    ``log_probs`` (per generated token), ``prompt_length``, and two
    sequence-level uncertainty scores computed in the decode loop for
    free: ``perplexity`` and ``generation_entropy`` (llm.scores
    semantics — hallucination flags per served request with no extra
    forward). Greedy decode is token-identical to
    ``JaxGenerator.generate`` per prompt.
    """

    def __init__(
        self,
        model,
        params,
        num_slots: int = 8,
        max_ctx: int = 512,
        max_new_tokens: int = 64,
        chunk_tokens: int = 8,
        eos_id: Optional[int] = None,
        do_sample: bool = False,
        temperature: float = 1.0,
        prompt_bucket: int = 16,
        key: Optional[jax.Array] = None,
        top_k: int = 0,
        top_p: float = 1.0,
        prefill_chunk: Optional[int] = None,
        prefix_cache: bool = False,
        draft_model=None,
        draft_params=None,
        gamma: int = 4,
        collect_rauq: bool = False,
        rauq_alpha: float = 0.2,
        collect_hidden: Optional[int] = None,
        spec_min_acceptance: Optional[float] = None,
        admission: str = "fifo",
        defer_fetch: bool = False,
        prefill_lanes: int = 1,
    ):
        # use_flash models are fully supported: chunked prefill rides the
        # valid-length flash kernel (ops/flash_prefill.py — the chunk's
        # queries attend the slot's cache prefix, key blocks past the
        # written window skipped), engaging on TPU for chunks >= 128
        # tokens; the bucketed path and decode steps use the dense masked
        # attention as before (the model routes per-call, models/llama.py).
        self.model = model
        self.params = params
        self.num_slots = int(num_slots)
        self.max_ctx = int(max_ctx)
        self.max_new_tokens = int(max_new_tokens)
        self.chunk_tokens = int(chunk_tokens)
        self.eos_id = eos_id
        self.do_sample = do_sample
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.prompt_bucket = max(1, int(prompt_bucket))
        # Chunked prefill: process prompts in fixed chunks of this many
        # tokens interleaved with decode chunks, so admitting a long prompt
        # stalls in-flight decodes by at most one chunk — and the engine
        # compiles exactly ONE prefill shape instead of one per bucketed
        # prompt length (each new shape costs 30-60 s over a tunneled TPU).
        # None keeps the whole-prompt bucketed prefill.
        if prefill_chunk is not None and int(prefill_chunk) <= 0:
            raise ValueError(f"prefill_chunk must be positive, got {prefill_chunk}")
        self.prefill_chunk = int(prefill_chunk) if prefill_chunk else None
        if self.prefill_chunk:
            if max_ctx % self.prefill_chunk:
                # Chunk writes are chunk-aligned; divisibility keeps the
                # last chunk inside the cache (dynamic_update_slice would
                # otherwise clamp backwards over real history).
                raise ValueError(
                    f"max_ctx={max_ctx} must be a multiple of "
                    f"prefill_chunk={prefill_chunk}"
                )
        # Automatic prefix caching (requires chunked prefill): when an
        # admitted prompt shares a chunk-aligned prefix with the prompt
        # already resident in some slot's cache rows, copy that slot's row
        # and prefill only the suffix. Prompt rows [0, p) are never
        # rewritten while a request runs, so the copy is exact (chunked
        # slots sit at physical row 0 — logical == physical — which is why
        # this is restricted to chunked mode; the bucketed path left-pads).
        self.prefix_cache = bool(prefix_cache)
        if self.prefix_cache and not self.prefill_chunk:
            raise ValueError("prefix_cache=True requires prefill_chunk")
        self._slot_prompt: List[Optional[list]] = [None] * int(num_slots)
        # In-loop RAUQ: collect each consumed token's attention to the
        # previous position (the _get_recurent_attention signal) and score
        # the request at finish — hallucination detection per served
        # response with zero extra forwards. In speculative mode the same
        # signal is gathered from the verify forward's attention rows.
        self.collect_rauq = bool(collect_rauq)
        self.rauq_alpha = float(rauq_alpha)
        # In-loop EigenScore signal: keep, per slot, the chosen-layer hidden
        # vector of the forward that produced the request's FINAL token —
        # the `hidden_states[-1][layer]` entry of the HF protocol (reference
        # llm_uncertainty/utils.py:102-117) — streamed into two (S, d_model)
        # device buffers updated inside the decode scan. Completion costs
        # one (S, d) fetch; the decode loop itself ships nothing extra.
        self.collect_hidden: Optional[int] = None
        if collect_hidden is not None:
            if draft_model is not None:
                raise NotImplementedError(
                    "collect_hidden is not supported on the speculative "
                    "engine (block emission makes the final-token forward "
                    "ambiguous); use the plain engine"
                )
            n_hiddens = int(model.num_layers) + 1
            li = int(collect_hidden)
            if li < 0:
                li += n_hiddens
            if not 0 <= li < n_hiddens:
                # Same failure the HF protocol's hidden_states[layer] hits,
                # but at construction time instead of mid-decode.
                raise ValueError(
                    f"collect_hidden={collect_hidden} out of range for a "
                    f"model with {n_hiddens} hidden-state entries"
                )
            self.collect_hidden = li
        self._hid_prev = None
        self._hid_last = None
        # Admission policy. "fifo" (default) preserves arrival order — the
        # latency-fairness choice for online traffic. "lpt" admits the
        # longest remaining budget first (longest-processing-time
        # scheduling): for offline/batch drains it packs the long requests
        # early so the short ones backfill the tail instead of one straggler
        # slot decoding alone while the rest idle — fewer total decode
        # chunks for the same useful tokens (decode chunks cost a full
        # weight read whether 1 slot or all of them emit).
        if admission not in ("fifo", "lpt"):
            raise ValueError(f"admission must be 'fifo' or 'lpt', got "
                             f"{admission!r}")
        self.admission = admission
        # Open-loop scheduling: with no EOS and no draft model, every
        # chunk's per-slot emission count is a pure function of the budgets
        # the host already knows — so the drain can dispatch chunk after
        # chunk WITHOUT fetching any harvest mid-drain, advancing its
        # mirrors by simulation and parsing all harvests once at the end.
        # This removes the per-chunk host round trip (the tunneled-TPU
        # drain's dominant cost) AND the lookahead refill penalty (a slot
        # is known to be free the moment its last chunk is dispatched, so
        # its refill rides the very next chunk). Token streaming still
        # works but arrives in one burst at drain end — leave this off for
        # latency-sensitive interactive traffic.
        # Chunked-prefill lane batching: advance up to this many
        # mid-prefill slots per program call (one (W, C) forward instead of
        # W (1, C) forwards). Over a tunneled device each program launch
        # and its argument uploads cost host milliseconds, so lane batching
        # is what keeps long-context prefill device-bound. lanes=1 keeps
        # the per-slot program (bit-identical to the batch-1 forward; wider
        # lanes can flip greedy argmax on near-tie logits, same trade the
        # fused drain documents for its prefill lanes).
        self.prefill_lanes = max(1, int(prefill_lanes))
        self._prefill_many_chunk_cache: Dict[int, Any] = {}
        self.defer_fetch = bool(defer_fetch)
        if self.defer_fetch:
            if eos_id is not None:
                raise ValueError(
                    "defer_fetch needs eos_id=None: EOS stops are data-"
                    "dependent, so the emission schedule would not be "
                    "host-predictable"
                )
            if draft_model is not None:
                raise ValueError(
                    "defer_fetch is not supported with speculative "
                    "decoding (acceptance makes emission data-dependent)"
                )
        self._copy_row_fn = None
        self.prefix_hits = 0  # observability: admissions served from cache
        # Serving observability (host counters, zero device cost): see
        # stats().
        self._stats = {
            "requests_finished": 0,
            "tokens_emitted": 0,
            "decode_chunks": 0,
            "prefill_chunks": 0,
            "deferred_admissions": 0,
            # Wall-time breakdown of the serving loop (seconds): where a
            # drain actually spends its time. "fetch" is the blocking wait
            # for each chunk's packed harvest (device execution drains
            # here), "dispatch" the async chunk-program launches, "prefill"
            # the prefill-program launches, "sched" the host bookkeeping.
            "t_fetch_s": 0.0,
            "t_dispatch_s": 0.0,
            "t_prefill_s": 0.0,
            "t_sched_s": 0.0,
        }
        if draft_model is not None:
            # Interactive speculative drains account acceptance exactly
            # (same convention as the fused drain's _last_fused_stats):
            # proposals counted over slots live at each round's start.
            self._stats["accepted"] = 0
            self._stats["proposed"] = 0
        # Per-slot speculative decoding: a small draft model proposes gamma
        # tokens per slot, one (S, gamma+1) target forward verifies them,
        # and every slot advances by its own acceptance count on the vector
        # clocks. Greedy is token-identical to the plain engine; sampled
        # mode is exact temperature rejection sampling (Leviathan et al.)
        # with the correction deferred through a per-slot residual
        # distribution. Requires chunked prefill (both caches sit at
        # physical row 0).
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.gamma = int(gamma)
        # Measured break-even guard: speculation only pays when the
        # acceptance rate clears the draft's cost ratio (see
        # speculative_breakeven). When set, the engine checks its exact
        # accepted/proposed counters at every drain start (after enough
        # evidence) and permanently falls back to the plain decode path if
        # the measured acceptance sits below this floor — shipping a
        # speculative config can then never run slower than the plain
        # engine for more than the first drain.
        self.spec_min_acceptance = (
            float(spec_min_acceptance) if spec_min_acceptance is not None
            else None
        )
        self._spec_disabled = False
        self._SPEC_EVIDENCE = 256  # proposals before the guard may fire
        self.d_cache = None
        self.samp_logp = None  # sampled-spec: per-slot log sampling dist
        self._seed_samp_fn = None
        if draft_model is not None:
            if not self.prefill_chunk:
                raise ValueError("speculative decoding requires prefill_chunk")
            if top_k or top_p < 1.0:
                raise NotImplementedError(
                    "the speculative engine path supports temperature "
                    "sampling only (no top-k/top-p); use "
                    "SpeculativeGenerator or the plain engine for those"
                )
            if draft_model.vocab_size != model.vocab_size:
                raise ValueError("draft and target must share one vocabulary")
            self.d_cache = init_cache(draft_model, int(num_slots),
                                      int(max_ctx))
            if do_sample:
                self.samp_logp = jnp.zeros(
                    (int(num_slots), model.vocab_size), jnp.float32
                )
        # Verify/draft passes write gamma+1 rows past a slot's clock; keep
        # that slack inside the cache so edge writes never clamp backwards.
        self._ctx_slack = self.gamma + 1 if draft_model is not None else 0
        self._key = key if key is not None else jax.random.key(0)

        vocab = model.vocab_size
        self.cache = init_cache(model, self.num_slots, self.max_ctx)
        self.step_logits = jnp.zeros((self.num_slots, vocab), jnp.float32)
        if self.collect_hidden is not None:
            d = int(model.d_model)
            self._hid_prev = jnp.zeros((self.num_slots, d), jnp.float32)
            self._hid_last = jnp.zeros((self.num_slots, d), jnp.float32)
        # Per-slot scheduling state lives on the HOST (numpy) and rides to
        # the device as one packed (4*S,) int32 upload per decode chunk.
        # Keeping it device-resident would mean one tiny dispatched program
        # per admission-time update (slot_pos/limit/active writes) — over a
        # tunneled device each eager op costs milliseconds of host blocking,
        # and a 32-admission refill burst was measured at ~18 ms *per
        # admission* in bookkeeping alone. The chunk programs return the
        # host-bound updates (emission counts + active flags) inside the
        # packed harvest, so the mirrors stay exact.
        self.slot_pos = np.zeros((self.num_slots,), np.int32)   # next write
        self.kv_start = np.zeros((self.num_slots,), np.int32)   # pad offset
        self.limit = np.zeros((self.num_slots,), np.int32)      # phys cap
        self.active = np.zeros((self.num_slots,), bool)
        # Per-slot sampling flags (do_sample engines only): a slot whose
        # request was submitted with sample=False decodes greedily inside
        # the SAME chunk program (a where-select on the step's tokens).
        # This is what lets one engine serve a deterministic pass and its
        # sampled duplicates in one drain (UncertaintyServer merged mode).
        self.samp_flags = np.zeros((self.num_slots,), np.int32)

        # Device-resident copy of the packed scheduling state, carried
        # chunk-to-chunk and edited in place by the prefill programs — the
        # lookahead dispatch launches the next chunk from it before the
        # host has processed the previous harvest.
        self._slot_state_dev = None

        self._prefill_cache: Dict[int, Any] = {}
        self._fused_cache: Dict[tuple, Any] = {}
        self._last_fused_stats: Dict[str, int] = {}
        self._chunk_fn = None
        self._spec_chunk_fn = None
        self._prefill_chunk_fn = None

        # host-side per-slot request bookkeeping
        self._slot_req: List[Optional[dict]] = [None] * self.num_slots
        self._queue: deque = deque()
        self._results: Dict[int, dict] = {}
        self._next_id = 0

    # -- device programs ------------------------------------------------------
    def _prefill_many_fn(self, F: int, p_pad: int):
        """Jitted: prefill ``F`` prompts into ``F`` distinct slots at once.

        F=1 is the trickle-refill shape; the batched shapes serve admission
        waves (see ``_BATCH_F``). One forward over the (F, p_pad) block is
        barely more expensive than batch 1 at weight-bound sizes; the rows
        are then spliced into each target slot (static unroll over F)."""
        if (F, p_pad) in self._prefill_cache:
            return self._prefill_cache[(F, p_pad)]
        key = ("prefill_many", self.model, self.max_ctx,
               self.collect_hidden, self.num_slots, F, p_pad)
        fn = _cached_program(key, lambda: self._build_prefill_many(F, p_pad))
        self._prefill_cache[(F, p_pad)] = fn
        return fn

    def _build_prefill_many(self, F: int, p_pad: int):
        model, max_ctx = self.model, self.max_ctx
        collect_hid = self.collect_hidden
        S = self.num_slots

        # Donate the big buffers: the cache row updates happen in place
        # instead of allocating a second full cache. The scheduling-state
        # edits ride this same program (the device copy stays authoritative
        # for the lookahead pipeline without extra dispatches).
        @partial(jax.jit, donate_argnums=(1, 2, 3, 10))
        def prefill(params, cache, step_logits, slot_state, slots, tokens,
                    valid, new_pos, new_kv, new_limit, hid_prev, samp):
            slot_state = slot_state.at[slots].set(new_pos)
            slot_state = slot_state.at[slots + S].set(new_kv)
            slot_state = slot_state.at[slots + 2 * S].set(new_limit)
            slot_state = slot_state.at[slots + 3 * S].set(1)
            slot_state = slot_state.at[slots + 4 * S].set(samp)
            # Fresh F-row cache for these prompts, then splice each row in.
            local = init_cache(model, F, max_ctx)
            kv_valid = jnp.concatenate(
                [valid, jnp.ones((F, max_ctx - p_pad), bool)], axis=1
            )
            positions = jnp.maximum(
                jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1, 0
            )
            logits, _, hiddens, local = model.apply(
                params, tokens, local, jnp.int32(0),
                token_valid=kv_valid, positions=positions,
            )
            if collect_hid is not None:
                # Left-padded prompts: the last REAL token sits at p_pad-1.
                hid_prev = hid_prev.at[slots].set(
                    hiddens[collect_hid, :, -1, :].astype(jnp.float32)
                )

            for i in range(F):
                def splice(g, l, i=i):
                    row = jax.lax.dynamic_slice_in_dim(l, i, 1, axis=0)
                    return jax.lax.dynamic_update_slice(
                        g, row.astype(g.dtype),
                        (slots[i],) + (0,) * (g.ndim - 1),
                    )

                cache = jax.tree_util.tree_map(splice, cache, local)
                step_logits = jax.lax.dynamic_update_slice(
                    step_logits, logits[i:i + 1, -1, :], (slots[i], 0)
                )
            return cache, step_logits, slot_state, hid_prev

        return prefill

    def _prefill_chunk_prog(self):
        """Jitted: advance ONE slot's prefill by ``prefill_chunk`` tokens.

        The slot is right-aligned at physical row 0 (no left padding —
        logical positions equal physical rows, so no masks are needed:
        earlier chunks' KV is real, and the causal mask keeps real queries
        from seeing the zero-padded tail of a final partial chunk). The tail
        writes garbage KV beyond the prompt, which is safe by the engine
        invariant: every cache row is rewritten by its owner (a later chunk
        or the decode step that lands on it) before anything attends it.
        One compiled shape serves every prompt length and slot.
        """
        if self._prefill_chunk_fn is not None:
            return self._prefill_chunk_fn
        draft = None if self._spec_disabled else self.draft_model
        key = ("prefill_chunk", self.model, draft, self.collect_hidden,
               self.num_slots)
        self._prefill_chunk_fn = _cached_program(
            key, self._build_prefill_chunk
        )
        return self._prefill_chunk_fn

    def _build_prefill_chunk(self):
        model = self.model
        draft = None if self._spec_disabled else self.draft_model
        collect_hid = self.collect_hidden
        S = self.num_slots

        def slice_row(cache, slot):
            return jax.tree_util.tree_map(
                lambda g: jax.lax.dynamic_slice_in_dim(g, slot, 1, axis=0),
                cache,
            )

        def splice_row(cache, row, slot):
            def splice(g, l):
                return jax.lax.dynamic_update_slice(
                    g, l.astype(g.dtype), (slot,) + (0,) * (g.ndim - 1)
                )

            return jax.tree_util.tree_map(splice, cache, row)

        @partial(jax.jit, donate_argnums=(2, 3, 4, 5, 13))
        def chunk_prefill(params, dparams, cache, d_cache, step_logits,
                          slot_state, slot, tokens, write_pos, last_idx,
                          is_last, parked_pos, limit, hid_prev, samp):
            # Scheduling-state edits ride this program (device copy stays
            # authoritative for the lookahead pipeline): park the clock at
            # the next write position, pin limit/kv_start, and activate the
            # slot on its final chunk.
            slot_state = slot_state.at[slot].set(parked_pos)
            slot_state = slot_state.at[slot + S].set(0)
            slot_state = slot_state.at[slot + 2 * S].set(limit)
            slot_state = slot_state.at[slot + 3 * S].set(
                is_last.astype(jnp.int32)
            )
            slot_state = slot_state.at[slot + 4 * S].set(samp)
            row = slice_row(cache, slot)
            logits, _, hiddens, row = model.apply(
                params, tokens, row, write_pos
            )
            cache = splice_row(cache, row, slot)
            if collect_hid is not None:
                # Seed the slot's "previous forward" hidden with the final
                # chunk's last REAL token — the prefill forward is what
                # produces the request's first generated token.
                hvec = jax.lax.dynamic_slice_in_dim(
                    hiddens[collect_hid, 0], last_idx, 1, axis=0
                ).astype(jnp.float32)
                seeded = jax.lax.dynamic_update_slice(
                    hid_prev, hvec, (slot, 0)
                )
                hid_prev = jnp.where(is_last, seeded, hid_prev)
            if draft is not None:
                # The draft tracks the same token stream on its own cache
                # (its KV is what the speculative rounds attend).
                d_row = slice_row(d_cache, slot)
                d_row = draft.apply(dparams, tokens, d_row, write_pos)[3]
                d_cache = splice_row(d_cache, d_row, slot)
            # Next-token logits live at the last REAL token of the final
            # chunk (the zero-padded tail's logits are garbage).
            sel = jax.lax.dynamic_slice_in_dim(logits[0], last_idx, 1, axis=0)
            updated = jax.lax.dynamic_update_slice(
                step_logits, sel, (slot, 0)
            )
            step_logits = jnp.where(is_last, updated, step_logits)
            return cache, d_cache, step_logits, slot_state, hid_prev

        return chunk_prefill

    def _prefill_chunk_many_prog(self, W: int):
        """Jitted: advance ``W`` slots' prefills by one chunk each in ONE
        program — the lane-batched form of :meth:`_prefill_chunk_prog`.

        One (W, C) forward serves W chunks of prompt; each lane's rows are
        gathered from / scattered back to its own slot, and the vector
        cache-index path gives every lane its own physical clock. Compiled
        once per distinct lane count (bounded by ``prefill_lanes``)."""
        fn = self._prefill_many_chunk_cache.get(W)
        if fn is not None:
            return fn
        draft = None if self._spec_disabled else self.draft_model
        key = ("prefill_lanes", self.model, draft, self.collect_hidden,
               self.num_slots, W)
        fn = _cached_program(
            key, lambda: self._build_prefill_chunk_many(W)
        )
        self._prefill_many_chunk_cache[W] = fn
        return fn

    def _build_prefill_chunk_many(self, W: int):
        model = self.model
        draft = None if self._spec_disabled else self.draft_model
        collect_hid = self.collect_hidden
        S = self.num_slots

        @partial(jax.jit, donate_argnums=(2, 3, 4, 5, 13))
        def chunk_prefill_many(params, dparams, cache, d_cache, step_logits,
                               slot_state, slots, tokens, write_pos,
                               last_idx, is_last, limit, samp, hid_prev,
                               parked):
            slot_state = slot_state.at[slots].set(parked)
            slot_state = slot_state.at[slots + S].set(0)
            slot_state = slot_state.at[slots + 2 * S].set(limit)
            slot_state = slot_state.at[slots + 3 * S].set(is_last)
            slot_state = slot_state.at[slots + 4 * S].set(samp)
            rows = jax.tree_util.tree_map(lambda g: g[slots], cache)
            logits, _, hiddens, rows = model.apply(
                params, tokens, rows, write_pos
            )
            cache = jax.tree_util.tree_map(
                lambda g, l: g.at[slots].set(l.astype(g.dtype)), cache, rows
            )
            if draft is not None:
                d_rows = jax.tree_util.tree_map(
                    lambda g: g[slots], d_cache
                )
                d_rows = draft.apply(dparams, tokens, d_rows, write_pos)[3]
                d_cache = jax.tree_util.tree_map(
                    lambda g, l: g.at[slots].set(l.astype(g.dtype)),
                    d_cache, d_rows,
                )
            # Final-chunk lanes: capture next-token logits at the last REAL
            # token; non-final lanes scatter out of bounds and drop.
            sel = jnp.take_along_axis(
                logits, last_idx[:, None, None], axis=1
            )[:, 0, :]
            tgt = jnp.where(is_last > 0, slots, S)
            step_logits = step_logits.at[tgt].set(
                sel.astype(step_logits.dtype), mode="drop"
            )
            if collect_hid is not None:
                hvec = jnp.take_along_axis(
                    hiddens[collect_hid], last_idx[:, None, None], axis=1
                )[:, 0, :].astype(jnp.float32)
                hid_prev = hid_prev.at[tgt].set(hvec, mode="drop")
            return cache, d_cache, step_logits, slot_state, hid_prev

        return chunk_prefill_many

    def _seed_samp(self):
        """Jitted: seed one slot's sampling distribution from its freshly
        prefetched next-token logits (log target probs at temperature —
        what the first speculative round samples tok0 from; later rounds
        replace it with the deferred residual)."""
        if self._seed_samp_fn is not None:
            return self._seed_samp_fn
        temp = self.temperature

        def build():
            @partial(jax.jit, donate_argnums=(0,))
            def seed(samp_logp, step_logits, slot):
                row = jax.lax.dynamic_slice_in_dim(
                    step_logits, slot, 1, axis=0
                )
                return jax.lax.dynamic_update_slice(
                    samp_logp, jax.nn.log_softmax(row / temp, axis=-1),
                    (slot, 0),
                )

            return seed

        self._seed_samp_fn = _cached_program(("seed_samp", temp), build)
        return self._seed_samp_fn

    def _copy_row(self):
        """Jitted: copy slot ``src``'s ENTIRE cache row onto slot ``dst``.

        Static shapes (the whole max_ctx row) so ONE program serves every
        prefix length; rows beyond the shared prefix carry the source's
        stale data, which the engine invariant makes unreachable (the
        suffix chunks and the decode steps rewrite them before any
        attention touches them)."""
        if self._copy_row_fn is not None:
            return self._copy_row_fn

        def build():
            @partial(jax.jit, donate_argnums=(0,))
            def copy_row(cache, src, dst):
                def cp(g):
                    row = jax.lax.dynamic_slice_in_dim(g, src, 1, axis=0)
                    return jax.lax.dynamic_update_slice(
                        g, row, (dst,) + (0,) * (g.ndim - 1)
                    )

                return jax.tree_util.tree_map(cp, cache)

            return copy_row

        self._copy_row_fn = _cached_program(("copy_row",), build)
        return self._copy_row_fn

    def _best_prefix(self, prompt: list, ignore_avail: bool = False) -> tuple:
        """(slot, chunk-aligned shared-prefix length) of the best resident
        match, or (None, 0). Only complete chunks are reusable (suffix
        prefill writes chunk-aligned), and at least one full chunk must
        match for the copy to pay for itself. ``ignore_avail`` scores the
        POTENTIAL match (what the donor will offer once its prefill
        finishes) — the admission scheduler uses it to decide whether
        waiting beats prefilling from scratch."""
        C = self.prefill_chunk
        best_slot, best_len = None, 0
        for slot, resident in enumerate(self._slot_prompt):
            if resident is None:
                continue
            # A mid-prefill source has only written rows [0, write_pos);
            # a finished/decoding one has its whole prompt resident (decode
            # writes land beyond it and are not matched).
            src_req = self._slot_req[slot]
            avail = (
                src_req["write_pos"]
                if not ignore_avail and src_req is not None
                and not src_req.get("prefill_done", True)
                else len(resident)
            )
            n = 0
            for a, b in zip(resident, prompt):
                if a != b:
                    break
                n += 1
            n = (min(n, avail) // C) * C
            # The full prompt must still grow past the copied prefix: the
            # next-token logits come from the suffix prefill, so at least
            # one real suffix token must exist.
            n = min(n, ((len(prompt) - 1) // C) * C)
            if n > best_len:
                best_slot, best_len = slot, n
        return best_slot, best_len

    def _slot_state(self) -> jnp.ndarray:
        """The host scheduling mirrors as ONE (5*S,) int32 device upload:
        [slot_pos | kv_start | limit | active | sample_flag]."""
        return jnp.asarray(np.concatenate([
            self.slot_pos, self.kv_start, self.limit,
            self.active.astype(np.int32), self.samp_flags,
        ]))

    def _chunk(self):
        """Jitted: K decode steps for all slots, per-slot clocks."""
        if self._chunk_fn is not None:
            return self._chunk_fn
        key = ("chunk", self.model, self.eos_id, self.max_ctx,
               self.chunk_tokens, self.do_sample, self.temperature,
               self.top_k, self.top_p, self.collect_rauq,
               self.collect_hidden, self.num_slots)
        self._chunk_fn = _cached_program(key, self._build_chunk)
        return self._chunk_fn

    def _build_chunk(self):
        model, eos = self.model, self.eos_id
        max_ctx, K = self.max_ctx, self.chunk_tokens
        do_sample, temperature = self.do_sample, self.temperature
        top_k, top_p = self.top_k, self.top_p
        collect_rauq = self.collect_rauq
        collect_hid = self.collect_hidden
        S = self.num_slots

        # hid_last is NOT donated: its input buffer (chunk k's output) must
        # stay readable after chunk k+1 is dispatched — _process_harvest
        # fetches completions' hidden vectors from the captured handle
        # under the lookahead pipeline. (S, d) f32 per chunk is noise.
        @partial(jax.jit, donate_argnums=(1, 2, 3, 5))
        def chunk(params, cache, step_logits, slot_state, rng_key,
                  hid_prev, hid_last):
            slot_pos, kv_start, limit, active = (
                slot_state[:S], slot_state[S:2 * S],
                slot_state[2 * S:3 * S], slot_state[3 * S:4 * S] > 0,
            )
            samp_flag = slot_state[4 * S:5 * S] > 0
            def body(carry, _):
                cache, step_logits, slot_pos, active, key, hp, hl = carry
                key, sub = jax.random.split(key)
                log_soft = jax.nn.log_softmax(step_logits, axis=-1)
                if do_sample:
                    from runia_core_tpu.llm.generate import sample_logits

                    # Per-request decoding mode: slots whose request was
                    # submitted with sample=False take the argmax instead
                    # of the draw (one where — both are computed anyway).
                    next_tok = jnp.where(
                        samp_flag,
                        sample_logits(
                            sub, step_logits, temperature, top_k, top_p
                        ),
                        jnp.argmax(step_logits, axis=-1),
                    )
                else:
                    next_tok = jnp.argmax(step_logits, axis=-1)
                lp = jnp.take_along_axis(
                    log_soft, next_tok[:, None], axis=-1
                )[:, 0]
                # A slot only emits while its clock is inside the budget
                # window (slot_pos < limit); a zero-budget request emits
                # nothing at all.
                emitted = active & (slot_pos < limit)
                lp = jnp.where(emitted, lp, -jnp.inf)
                next_tok = jnp.where(emitted, next_tok, 0)
                # In-loop uncertainty: serving gets per-token entropy for
                # free (one (S, V) reduction per step, noise next to the
                # decode matmuls).
                ent = _vocab_norm_entropy(log_soft)
                if eos is not None:
                    active = active & (next_tok != eos)

                # Physical rows each slot may attend: its own [kv_start,
                # slot_pos] window (upper bound enforced causally by the
                # per-slot clock).
                kv_valid = (
                    jnp.arange(max_ctx)[None, :] >= kv_start[:, None]
                )
                positions = (slot_pos - kv_start)[:, None]
                new_logits, attn, hiddens, cache = model.apply(
                    params, next_tok[:, None], cache, slot_pos,
                    token_valid=kv_valid, positions=positions,
                )
                if collect_hid is not None:
                    # An emission's producing forward ran BEFORE this step
                    # (prefill, or the previous step's apply) — so commit
                    # hp into hl first, then absorb this forward's vector.
                    hl = jnp.where(emitted[:, None], hp, hl)
                    hp = jnp.where(
                        emitted[:, None],
                        hiddens[collect_hid, :, 0, :].astype(jnp.float32),
                        hp,
                    )
                if collect_rauq:
                    # RAUQ's per-step signal: the consumed token's attention
                    # to the immediately-previous position (column -2 of the
                    # incremental row — attention.py::_get_recurent_attention
                    # semantics). attn is (L, S, H, 1, kv); gather one
                    # column per slot.
                    prev = jnp.maximum(slot_pos - 1, 0)  # (S,)
                    att_prev = jnp.take_along_axis(
                        attn[:, :, :, 0, :],
                        prev[None, :, None, None], axis=-1,
                    )[..., 0]  # (L, S, H)
                else:
                    att_prev = jnp.zeros((), jnp.float32)
                # Only active slots advance their clock; stopping keeps the
                # slot's cache frozen until refill. Budget: a slot whose next
                # write position would overflow its limit goes inactive.
                slot_pos = slot_pos + emitted.astype(jnp.int32)
                active = active & (slot_pos < limit)
                step_logits = jnp.where(
                    emitted[:, None], new_logits[:, 0, :], step_logits
                )
                return (
                    (cache, step_logits, slot_pos, active, key, hp, hl),
                    (next_tok, lp, ent, att_prev, emitted),
                )

            (cache, step_logits, slot_pos, active, rng_key, hid_prev,
             hid_last), out = jax.lax.scan(
                body,
                (cache, step_logits, slot_pos, active, rng_key, hid_prev,
                 hid_last),
                None, length=K,
            )
            toks, lps, ents, att_prev, emitted = out
            packed = _pack_harvest(toks, lps, ents, emitted, active)
            # Device-resident copy of the post-chunk scheduling state: the
            # NEXT chunk can launch from it without waiting for the host to
            # see this chunk's harvest (the lookahead pipeline).
            new_state = jnp.concatenate(
                [slot_pos, kv_start, limit, active.astype(jnp.int32),
                 slot_state[4 * S:]]
            )
            return (cache, step_logits, new_state, rng_key, packed, att_prev,
                    hid_prev, hid_last)

        return chunk

    def _spec_chunk(self):
        """Jitted: R speculative rounds for all slots, per-slot clocks.

        Each round: select every slot's next token (greedy: argmax of its
        ``step_logits`` row; sampled: a draw from its ``samp_logp``
        distribution), draft ``gamma`` proposals per slot (vector-clock
        draft cache), verify the (S, gamma+1) block with ONE target
        forward, and emit the agreeing/accepted prefix. The correction
        token is DEFERRED: greedy carries the target's raw row at the
        rejection index forward (next round's argmax IS the correction —
        token-identical to the plain engine); sampled carries the
        Leviathan residual ``max(p_target - p_draft, 0)`` as the next
        round's sampling distribution, so every emitted token is an EXACT
        temperature sample of the target. Rejected rows leave stale K/V
        that the next round's writes cover before anything attends them
        (the row-ownership invariant).
        """
        if self._spec_chunk_fn is not None:
            return self._spec_chunk_fn
        key = ("spec_chunk", self.model, self.draft_model, self.gamma,
               self.eos_id, self.do_sample, self.temperature,
               self.collect_rauq, self.chunk_tokens, self.num_slots)
        self._spec_chunk_fn = _cached_program(key, self._build_spec_chunk)
        return self._spec_chunk_fn

    def _build_spec_chunk(self):
        spec_round = _make_spec_round(
            self.model, self.draft_model, self.gamma, self.eos_id,
            self.do_sample, self.temperature, self.collect_rauq,
        )
        # chunk_tokens keeps its "approx tokens per host sync" meaning.
        gamma = self.gamma
        rounds = max(1, self.chunk_tokens // (gamma + 1))
        S = self.num_slots

        @partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6))
        def chunk(params, dparams, t_cache, d_cache, step_logits, samp_logp,
                  slot_state, rng_key):
            # chunked layout: physical == logical, kv_start unused (== 0)
            kv_start = slot_state[S:2 * S]
            slot_pos, limit, active = (
                slot_state[:S], slot_state[2 * S:3 * S],
                slot_state[3 * S:4 * S] > 0,
            )

            def body(carry, key):
                (t_cache, d_cache, step_logits, samp_logp, slot_pos,
                 active) = carry
                r = spec_round(params, dparams, t_cache, d_cache,
                               step_logits, samp_logp, slot_pos, active,
                               limit, key)
                lps = jnp.where(r["emit"], r["lps"], -jnp.inf)
                emission = jnp.where(r["emit"], r["block"], 0)
                # Acceptance accounting over slots live this round (same
                # convention as the fused drain's stats).
                acc_pair = jnp.stack([
                    jnp.sum(jnp.where(active, r["n_acc"], 0)),
                    jnp.sum(jnp.where(active, gamma, 0)),
                ])
                return (
                    (r["cache"], r["d_cache"], r["step_logits"],
                     r["samp_logp"], r["slot_pos"], r["active"]),
                    (emission, lps, r["ents"], r["att_prev"], r["emit"],
                     acc_pair),
                )

            rng_key, sub = jax.random.split(rng_key)
            (t_cache, d_cache, step_logits, samp_logp, slot_pos, active), (
                out
            ) = jax.lax.scan(
                body,
                (t_cache, d_cache, step_logits, samp_logp, slot_pos, active),
                jax.random.split(sub, rounds),
            )
            toks, lps, ents, att_prev, emit, acc_pairs = out
            packed = _pack_harvest(toks, lps, ents, emit, active,
                                   extra=jnp.sum(acc_pairs, axis=0))
            new_state = jnp.concatenate(
                [slot_pos, kv_start, limit, active.astype(jnp.int32),
                 slot_state[4 * S:]]
            )
            return (t_cache, d_cache, step_logits, samp_logp, new_state,
                    rng_key, packed, att_prev)

        return chunk

    # -- host-side scheduling -------------------------------------------------
    def _refill(self) -> None:
        """Assign queued prompts to every free slot (chunked mode defers the
        device work to :meth:`_advance_prefills`; classic mode prefills the
        whole bucketed prompt here)."""
        t0 = time.perf_counter()
        try:
            self._refill_inner()
        finally:
            self._stats["t_prefill_s"] += time.perf_counter() - t0

    def _refill_inner(self) -> None:
        if self.admission == "lpt" and len(self._queue) > 1:
            # Stable sort: equal budgets keep arrival order.
            self._queue = deque(
                sorted(self._queue, key=lambda r: -r["max_new"])
            )
        free = [
            s for s in range(self.num_slots) if self._slot_req[s] is None
        ]
        classic_admissions: List[tuple] = []
        for slot in free:
            if not self._queue:
                break
            req = self._queue.popleft()
            p = len(req["prompt"])
            if self.prefill_chunk:
                req["pending"] = list(req["prompt"])
                req["write_pos"] = 0
                req["prefill_done"] = False
                if self.prefix_cache:
                    src, n = self._best_prefix(req["prompt"])
                    pot = self._best_prefix(req["prompt"],
                                            ignore_avail=True)[1]
                    if pot > n:
                        # A better donor is still mid-prefill (e.g. the
                        # first of N duplicate submissions): requeue and
                        # wait a round rather than prefilling from scratch
                        # — the donor advances one chunk per scheduler
                        # iteration, so this converges.
                        self._queue.appendleft(req)
                        self._stats["deferred_admissions"] += 1
                        break
                    if n > 0:
                        if src != slot:
                            self.cache = self._copy_row()(
                                self.cache, jnp.int32(src), jnp.int32(slot)
                            )
                            if self.d_cache is not None:
                                self.d_cache = self._copy_row()(
                                    self.d_cache, jnp.int32(src),
                                    jnp.int32(slot),
                                )
                        # src == slot: the previous occupant's prompt rows
                        # are already resident — reuse with zero copies.
                        req["pending"] = req["prompt"][n:]
                        req["write_pos"] = n
                        self.prefix_hits += 1
                self._slot_prompt[slot] = list(req["prompt"])
                # Physical row 0 start: logical == physical, kv_start 0.
                # Park the decode clock at the next write position so stray
                # decode writes for this inactive slot land where the next
                # chunk overwrites them.
                self.kv_start[slot] = 0
                self.slot_pos[slot] = req["write_pos"]
                self.limit[slot] = min(p + req["max_new"], self.max_ctx)
                self.active[slot] = False
                self.samp_flags[slot] = int(req["sample"])
                self._slot_req[slot] = req
                continue
            p_pad = -(-max(p, 1) // self.prompt_bucket) * self.prompt_bucket
            classic_admissions.append((slot, req, p, p_pad))
        if classic_admissions:
            self._admit_classic(classic_admissions)

    # Same-bucket admissions ride one batched prefill program in groups of
    # this size. Slots free in WAVES (one decode chunk retires several
    # requests at once), and a batch-1 prefill at serving model sizes is
    # weight-bound — F prompts cost barely more HBM traffic than one.
    _BATCH_F = 8

    def _admit_classic(self, admissions: List[tuple]) -> None:
        """Prefill classic-mode admissions, batching same-bucket groups."""
        by_pad: Dict[int, List[tuple]] = {}
        for adm in admissions:
            by_pad.setdefault(adm[3], []).append(adm)
        for p_pad, group in by_pad.items():
            while len(group) >= self._BATCH_F:
                self._prefill_group(group[:self._BATCH_F], p_pad)
                group = group[self._BATCH_F:]
            for single in group:
                self._prefill_group([single], p_pad)

    def _prefill_group(self, group: List[tuple], p_pad: int) -> None:
        """One (F, p_pad) prefill program admitting ``group`` together."""
        F = len(group)
        tokens = np.zeros((F, p_pad), np.int32)
        valid = np.zeros((F, p_pad), bool)
        slots = np.zeros((F,), np.int32)
        kvs = np.zeros((F,), np.int32)
        lims = np.zeros((F,), np.int32)
        samp = np.zeros((F,), np.int32)
        for i, (slot, req, p, _) in enumerate(group):
            tokens[i, p_pad - p:] = np.asarray(req["prompt"], np.int32)
            valid[i, p_pad - p:] = True
            slots[i] = slot
            kvs[i] = p_pad - p
            lims[i] = min(p_pad + req["max_new"], self.max_ctx)
            samp[i] = int(req["sample"])
        (self.cache, self.step_logits, self._slot_state_dev,
         self._hid_prev) = self._prefill_many_fn(F, p_pad)(
            self.params, self.cache, self.step_logits, self._slot_state_dev,
            jnp.asarray(slots), jnp.asarray(tokens), jnp.asarray(valid),
            jnp.full((F,), p_pad, jnp.int32), jnp.asarray(kvs),
            jnp.asarray(lims), self._hid_prev, jnp.asarray(samp),
        )
        for slot, req, p, _ in group:
            self.slot_pos[slot] = p_pad
            self.kv_start[slot] = p_pad - p
            self.limit[slot] = min(p_pad + req["max_new"], self.max_ctx)
            self.active[slot] = True
            self.samp_flags[slot] = int(req["sample"])
            self._slot_req[slot] = req

    def _advance_prefills(self) -> None:
        """Advance every mid-prefill slot by one chunk; on a slot's final
        chunk, capture its next-token logits and activate it for decode.
        With ``prefill_lanes > 1`` the pending slots ride lane-batched
        programs (one (W, C) forward per group)."""
        if not self.prefill_chunk:
            return
        if self.prefill_lanes > 1:
            pend = [
                (s, r) for s, r in enumerate(self._slot_req)
                if r is not None and not r.get("prefill_done", True)
            ]
            for i in range(0, len(pend), self.prefill_lanes):
                self._advance_lane_group(pend[i:i + self.prefill_lanes])
            return
        C = self.prefill_chunk
        fn = self._prefill_chunk_prog()
        for slot, req in enumerate(self._slot_req):
            if req is None or req.get("prefill_done", True):
                continue
            take = req["pending"][:C]
            req["pending"] = req["pending"][C:]
            toks = np.zeros((1, C), np.int32)
            toks[0, : len(take)] = take
            is_last = not req["pending"]
            limit = min(len(req["prompt"]) + req["max_new"], self.max_ctx)
            (self.cache, self.d_cache, self.step_logits,
             self._slot_state_dev, self._hid_prev) = fn(
                self.params, self.draft_params,
                self.cache, self.d_cache, self.step_logits,
                self._slot_state_dev,
                jnp.int32(slot), jnp.asarray(toks),
                jnp.int32(req["write_pos"]),
                jnp.int32(len(take) - 1), jnp.asarray(is_last),
                jnp.int32(req["write_pos"] + len(take)), jnp.int32(limit),
                self._hid_prev, jnp.int32(req["sample"]),
            )
            req["write_pos"] += len(take)
            self._stats["prefill_chunks"] += 1
            # Park the decode clock at the next write position (chunk
            # boundary mid-prefill; the true next-token slot once done).
            self.slot_pos[slot] = req["write_pos"]
            if is_last:
                req["prefill_done"] = True
                self.active[slot] = True
                if self.samp_logp is not None:
                    self.samp_logp = self._seed_samp()(
                        self.samp_logp, self.step_logits, jnp.int32(slot)
                    )

    def _advance_lane_group(self, group: List[tuple]) -> None:
        """Advance one lane group's prefills by one chunk via the batched
        program (see ``_prefill_chunk_many_prog``)."""
        C = self.prefill_chunk
        W = len(group)
        toks = np.zeros((W, C), np.int32)
        slots = np.zeros((W,), np.int32)
        wpos = np.zeros((W,), np.int32)
        last_idx = np.zeros((W,), np.int32)
        is_last = np.zeros((W,), np.int32)
        lims = np.zeros((W,), np.int32)
        samp = np.zeros((W,), np.int32)
        parked = np.zeros((W,), np.int32)
        for i, (slot, req) in enumerate(group):
            take = req["pending"][:C]
            req["pending"] = req["pending"][C:]
            toks[i, : len(take)] = take
            slots[i] = slot
            wpos[i] = req["write_pos"]
            last_idx[i] = len(take) - 1
            is_last[i] = not req["pending"]
            lims[i] = min(len(req["prompt"]) + req["max_new"], self.max_ctx)
            samp[i] = int(req["sample"])
            parked[i] = req["write_pos"] + len(take)
        fn = self._prefill_chunk_many_prog(W)
        (self.cache, self.d_cache, self.step_logits, self._slot_state_dev,
         self._hid_prev) = fn(
            self.params, self.draft_params, self.cache, self.d_cache,
            self.step_logits, self._slot_state_dev, jnp.asarray(slots),
            jnp.asarray(toks), jnp.asarray(wpos), jnp.asarray(last_idx),
            jnp.asarray(is_last), jnp.asarray(lims), jnp.asarray(samp),
            self._hid_prev, jnp.asarray(parked),
        )
        self._stats["prefill_chunks"] += 1
        for i, (slot, req) in enumerate(group):
            req["write_pos"] = int(parked[i])
            self.slot_pos[slot] = req["write_pos"]
            if is_last[i]:
                req["prefill_done"] = True
                self.active[slot] = True
                if self.samp_logp is not None:
                    self.samp_logp = self._seed_samp()(
                        self.samp_logp, self.step_logits, jnp.int32(slot)
                    )

    def _finish_slot(self, slot: int, hid_np=None) -> None:
        req = self._slot_req[slot]
        self._slot_req[slot] = None
        self._finish_req(req, hid_np[slot] if hid_np is not None else None)

    def _finish_req(self, req: dict, hid_row=None) -> None:
        """Record one finished request's result (slot-independent so the
        open-loop drain can finish a request whose slot was already
        reassigned by the time its harvest is parsed)."""
        toks, lps, ents = req["tokens"], req["lps"], req["ents"]
        atts = req["atts"]
        if self.eos_id is not None and self.eos_id in toks:
            cut = toks.index(self.eos_id)
            toks, lps, ents = toks[:cut], lps[:cut], ents[:cut]
            atts = atts[:cut]
        lps_arr = np.asarray(lps, np.float32)
        ents_arr = np.asarray(ents, np.float32)
        self._results[req["id"]] = {
            "tokens": toks,
            "log_probs": lps_arr,
            "prompt_length": len(req["prompt"]),
            # Sequence-level uncertainty for free (llm.scores semantics):
            # perplexity = mean -log p of the emitted tokens (scores.py::
            # perplexity); generation_entropy = vocab-normalized per-step
            # distribution entropy averaged over the emitted tokens
            # (scores.py::generation_entropy). nan for zero-token results.
            "perplexity": float(-lps_arr.mean()) if len(toks) else float("nan"),
            "generation_entropy": (
                float(ents_arr.mean()) if len(toks) else float("nan")
            ),
        }
        self._stats["requests_finished"] += 1
        if self.collect_hidden is not None:
            # hidden_states[-1][layer] of the HF protocol: the chosen-layer
            # hidden vector of the forward that produced the final kept
            # token. Unlike HF generate (which reports the final decode
            # STEP, including post-EOS garbage rows for short sequences in
            # a batch), each request's vector here belongs to its OWN last
            # token — identical when no EOS fires, strictly better when one
            # does. None for zero-token results.
            self._results[req["id"]]["hidden"] = (
                hid_row.copy()
                if hid_row is not None and len(toks) else None
            )
        if self.collect_rauq:
            from runia_core_tpu.llm.scores import rauq_uncertainty

            # attention_weights entry i = attention of token i to its
            # previous position; _get_recurent_attention drops the last
            # token's entry (it is never consumed in the HF protocol).
            self._results[req["id"]]["rauq"] = (
                rauq_uncertainty(
                    lps_arr, None, "original",
                    alphas=[self.rauq_alpha],
                    attention_weights=np.stack(atts[: len(toks) - 1], -1),
                )
                if len(toks) >= 2 else float("nan")
            )

    def _validate_request(
        self, prompt: List[int], max_new_tokens: Optional[int]
    ) -> int:
        """Check one request against the engine's capacity; returns its
        resolved ``max_new`` budget. Raises without mutating any state, so
        batch submitters can validate everything before enqueuing anything."""
        p = len(prompt)
        max_new = int(
            self.max_new_tokens if max_new_tokens is None else max_new_tokens
        )
        if self.prefill_chunk:
            if p == 0:
                raise ValueError("chunked prefill needs a non-empty prompt")
            if p + max_new + self._ctx_slack > self.max_ctx:
                raise ValueError(
                    f"prompt of {p} tokens + {max_new} new "
                    f"(+{self._ctx_slack} speculative slack) exceeds "
                    f"max_ctx={self.max_ctx}"
                )
        else:
            p_pad = -(-max(p, 1) // self.prompt_bucket) * self.prompt_bucket
            if p_pad + max_new > self.max_ctx:
                raise ValueError(
                    f"prompt of {p} tokens (bucketed to {p_pad}) + "
                    f"{max_new} new exceeds max_ctx={self.max_ctx}"
                )
        return max_new

    def submit(self, prompt_tokens: Sequence[int],
               max_new_tokens: Optional[int] = None,
               sample: Optional[bool] = None) -> int:
        """Enqueue one prompt; returns its request id. ``max_new_tokens``
        overrides the engine default for THIS request (real traffic has
        per-request budgets; the slot frees as soon as its own budget or
        EOS hits, not the longest request's).

        ``sample`` overrides the engine's decoding mode for THIS request:
        a ``do_sample=True`` engine serves ``sample=False`` requests
        greedily in the same chunk programs (per-slot flag select), so one
        engine can drain a deterministic pass and its sampled duplicates
        together. ``sample=True`` on a greedy engine raises — its compiled
        programs have no sampling path.

        Validation happens HERE, per request — a bad request must fail
        fast at enqueue time, not raise mid-drain and poison every other
        in-flight request's results.
        """
        prompt = list(prompt_tokens)
        max_new = self._validate_request(prompt, max_new_tokens)
        if sample is None:
            sample = self.do_sample
        elif sample and not self.do_sample:
            raise ValueError(
                "sample=True on a greedy engine (construct with "
                "do_sample=True to serve mixed decoding modes)"
            )
        elif self.draft_model is not None and sample != self.do_sample:
            raise NotImplementedError(
                "per-request decoding modes are not supported on the "
                "speculative engine (the verify path is mode-global)"
            )
        rid = self._next_id
        self._next_id += 1
        self._queue.append({
            "id": rid, "prompt": prompt, "tokens": [],
            "lps": [], "ents": [], "atts": [],
            "max_new": max_new, "sample": bool(sample),
        })
        return rid

    def run_until_drained(self) -> None:
        """Decode until every submitted request has a result."""
        for _ in self.stream():
            pass

    def stream(self):
        """Drain the engine, yielding ``(request_id, new_token_ids)``
        increments as each device chunk lands — the serving surface for
        token streaming. Increments are EOS-consistent: once a request's
        EOS appears, nothing past it is ever yielded, so the concatenated
        increments equal the final result's ``tokens`` exactly. A request
        may yield several times (long budgets, small ``chunk_tokens``) or
        zero times (zero-budget requests).

        The drain loop is PIPELINED (lookahead 1): chunk k+1 is dispatched
        from the device-resident scheduling state before chunk k's harvest
        is fetched, so the host's fetch round trip, bookkeeping, and refill
        dispatches all overlap chunk k+1's device execution. The price is
        that a slot freed during chunk k idles through chunk k+1 before its
        refill decodes — on a tunneled device the hidden round trips win.

        ``defer_fetch=True`` engines run OPEN-LOOP instead (see
        :meth:`_stream_deferred`): no mid-drain fetches at all, all events
        yielded in one burst at drain end.
        """
        if self.defer_fetch:
            yield from self._stream_deferred()
            return
        self._maybe_disable_spec()
        spec = self.draft_model is not None and not self._spec_disabled
        chunk = self._spec_chunk() if spec else self._chunk()
        # Fresh device copy of the scheduling state for this drain; from
        # here on the prefill/decode programs edit it in place and the
        # host mirrors track it through the harvests.
        self._slot_state_dev = self._slot_state()
        self._refill()
        inflight = None
        while any(r is not None for r in self._slot_req) or inflight:
            t0 = time.perf_counter()
            self._advance_prefills()
            self._stats["t_prefill_s"] += time.perf_counter() - t0
            nxt = None
            if self.active.any():
                # Tail guard: when the queue is empty and the chunk already
                # in flight covers every live request's remaining budget,
                # don't dispatch a lookahead chunk that would decode for
                # (mostly) finished slots — process the in-flight harvest
                # first and let the next iteration dispatch only if work
                # actually remains. Costs pipelining on the final chunk
                # only; saves a full weight-read per drain.
                if not (inflight is not None and self._tail_drain()):
                    nxt = self._dispatch_chunk(chunk, spec)
            elif inflight is None:
                # Nothing decodable and nothing in flight (all occupied
                # slots mid-prefill): keep prefilling. The host mirror
                # answers this without a device round trip.
                self._refill()
                continue
            if inflight is not None:
                yield from self._process_harvest(*inflight, spec=spec)
            inflight = nxt
            self._refill()

    def _stream_deferred(self):
        """Open-loop drain (``defer_fetch=True``): dispatch every chunk and
        prefill WITHOUT fetching a single harvest mid-drain.

        With no EOS and no draft, each chunk's per-slot emission count is
        ``min(chunk_tokens, remaining budget)`` — a pure function of state
        the host already holds — so the scheduling mirrors advance by
        simulation, refills ride the very next chunk (no lookahead idle),
        and the drain's wall-clock is the DEVICE's: prefills and decode
        chunks queue back to back while every harvest's device->host copy
        streams in the background. One fetch pass at the end parses the
        harvests into results (and asserts they match the simulation).
        """
        chunk = self._chunk()
        self._slot_state_dev = self._slot_state()
        self._refill()
        pending: List[tuple] = []
        while any(r is not None for r in self._slot_req):
            t0 = time.perf_counter()
            self._advance_prefills()
            self._stats["t_prefill_s"] += time.perf_counter() - t0
            if self.active.any():
                packed, atts_dev, owners, hid_dev = self._dispatch_chunk(
                    chunk, False
                )
                owner_reqs = {
                    s: self._slot_req[s]
                    for s in range(self.num_slots) if owners[s] is not None
                }
                finished = self._simulate_chunk(owner_reqs)
                pending.append(
                    (packed, atts_dev, hid_dev, owner_reqs, finished)
                )
            self._refill()
        yield from self._flush_deferred(pending)

    def _simulate_chunk(self, owner_reqs: Dict[int, dict]) -> List[dict]:
        """Advance the host mirrors exactly as the dispatched chunk will:
        each owned slot emits ``min(chunk_tokens, limit - clock)`` tokens
        (deterministic — no EOS). Returns the requests that finish in this
        chunk and frees their slots immediately."""
        finished = []
        self._stats["decode_chunks"] += 1
        for slot, req in owner_reqs.items():
            n = max(0, min(self.chunk_tokens,
                           int(self.limit[slot]) - int(self.slot_pos[slot])))
            self.slot_pos[slot] += n
            req["sim_len"] = req.get("sim_len", 0) + n
            if (self.slot_pos[slot] >= self.limit[slot]
                    or req["sim_len"] >= req["max_new"]):
                self.active[slot] = False
                self._slot_req[slot] = None
                finished.append(req)
        return finished

    def _flush_deferred(self, pending: List[tuple]):
        """Fetch + parse every deferred harvest in dispatch order, append
        emissions to their (simulation-tracked) requests, and finish the
        requests the simulation marked done in each chunk."""
        t1 = time.perf_counter()
        events = []
        K = self.chunk_tokens
        for packed, atts_dev, hid_dev, owner_reqs, finished in pending:
            packed_np = np.asarray(packed)
            atts_np = np.asarray(atts_dev) if self.collect_rauq else None
            toks, lps, ents, emitted, _, _ = _unpack_harvest(
                packed_np, (K, self.num_slots), self.num_slots
            )
            self._stats["tokens_emitted"] += int(emitted.sum())
            hid_np = None
            for slot, req in owner_reqs.items():
                before = len(req["tokens"])
                for k in range(K):
                    if emitted[k, slot]:
                        req["tokens"].append(int(toks[k, slot]))
                        req["lps"].append(float(lps[k, slot]))
                        req["ents"].append(float(ents[k, slot]))
                        if atts_np is not None:
                            req["atts"].append(atts_np[k, :, slot, :].copy())
                new = req["tokens"][before:]
                if new:
                    events.append((req["id"], new))
            for req in finished:
                if len(req["tokens"]) != req["sim_len"]:
                    raise RuntimeError(
                        f"open-loop schedule diverged from the device for "
                        f"request {req['id']}: simulated {req['sim_len']} "
                        f"emissions, harvested {len(req['tokens'])}"
                    )
                hid_row = None
                if self.collect_hidden is not None:
                    if hid_np is None:
                        hid_np = np.asarray(hid_dev)
                    # The slot the request occupied when this chunk ran:
                    # recover it from owner_reqs (id-stable mapping).
                    slot = next(s for s, r in owner_reqs.items() if r is req)
                    hid_row = hid_np[slot]
                self._finish_req(req, hid_row)
        self._stats["t_fetch_s"] += time.perf_counter() - t1
        yield from events

    def _maybe_disable_spec(self) -> None:
        """Drain-boundary break-even check (see ``spec_min_acceptance``).
        Only at drain boundaries: sampled-mode exactness rides the per-slot
        residual distribution between rounds, so the decode path must not
        change mid-drain. Disabling recompiles one prefill program (the
        draft-cache branch drops out); the draft cache stays allocated."""
        if (
            self.spec_min_acceptance is None or self._spec_disabled
            or self.draft_model is None
            or self._stats.get("proposed", 0) < self._SPEC_EVIDENCE
        ):
            return
        acc = self._stats["accepted"] / self._stats["proposed"]
        if acc < self.spec_min_acceptance:
            warnings.warn(
                f"speculative decoding disabled: measured acceptance "
                f"{acc:.3f} < break-even {self.spec_min_acceptance:.3f} "
                f"(gamma={self.gamma}); continuing on the plain decode path"
            )
            self._spec_disabled = True
            self._stats["spec_disabled"] = 1
            # rebuild the prefill programs without the draft leg
            self._prefill_chunk_fn = None
            self._prefill_many_chunk_cache.clear()

    def _tail_drain(self) -> bool:
        """True when the in-flight chunk plausibly completes every live
        request: the queue is empty, no slot is mid-prefill, and each
        decodable request's remaining budget fits in one chunk."""
        if self._queue:
            return False
        for req in self._slot_req:
            if req is None:
                continue
            if not req.get("prefill_done", True):
                return False
            if req["max_new"] - len(req["tokens"]) > self.chunk_tokens:
                return False
        return True

    def _dispatch_chunk(self, chunk, spec):
        """Launch one decode chunk from the device scheduling state and
        start its harvest's device->host copy; returns the harvest handles
        plus the per-slot request ids the chunk could decode for (the
        ownership tags that keep a later-refilled slot from being confused
        with the request the chunk actually served)."""
        owners = [
            req["id"]
            if req is not None and req.get("prefill_done", True)
            and self.active[s] else None
            for s, req in enumerate(self._slot_req)
        ]
        t0 = time.perf_counter()
        hid_dev = None
        if spec:
            (self.cache, self.d_cache, self.step_logits, self.samp_logp,
             self._slot_state_dev, self._key, packed, atts_dev) = chunk(
                self.params, self.draft_params, self.cache, self.d_cache,
                self.step_logits, self.samp_logp, self._slot_state_dev,
                self._key,
            )
        else:
            (self.cache, self.step_logits, self._slot_state_dev, self._key,
             packed, atts_dev, self._hid_prev, self._hid_last) = chunk(
                self.params, self.cache, self.step_logits,
                self._slot_state_dev, self._key, self._hid_prev,
                self._hid_last,
            )
            # THIS chunk's hid_last handle rides the inflight tuple: by the
            # time its harvest is processed, self._hid_last already points
            # at the lookahead chunk's output, and fetching that instead
            # would block the host on chunk k+1 finishing (correct — rows
            # are emission-gated/frozen — but it forfeits the pipelining).
            hid_dev = self._hid_last
        # Start the device->host copies NOW: they ride the device queue
        # right behind this chunk, so by the time the host blocks on
        # np.asarray the transfer is already in flight (or done).
        packed.copy_to_host_async()
        if self.collect_rauq:
            atts_dev.copy_to_host_async()
        if self.collect_hidden is not None and hid_dev is not None:
            hid_dev.copy_to_host_async()
        self._stats["t_dispatch_s"] += time.perf_counter() - t0
        return packed, atts_dev, owners, hid_dev

    def _process_harvest(self, packed, atts_dev, owners, hid_dev, spec):
        """Fetch + unpack one chunk's harvest, advance the host mirrors,
        append/yield emissions, and finish completed requests.

        Emission events are collected first and yielded at the end so the
        ``t_sched_s`` window times ONLY this engine's host bookkeeping —
        a consumer pausing mid-iteration of :meth:`stream` must not bill
        its own time to the scheduler."""
        t1 = time.perf_counter()
        packed_np = np.asarray(packed)
        atts_np = np.asarray(atts_dev) if self.collect_rauq else None
        self._stats["t_fetch_s"] += time.perf_counter() - t1
        t_sched = time.perf_counter()
        events = []
        hid_np = None
        if spec:
            rounds = max(1, self.chunk_tokens // (self.gamma + 1))
            toks, lps, ents, emitted, active_now, acc_pair = _unpack_harvest(
                packed_np,
                (rounds, self.num_slots, self.gamma + 1), self.num_slots,
                n_extra=2,
            )
            self._stats["accepted"] += int(acc_pair[0])
            self._stats["proposed"] += int(acc_pair[1])
            # (R, S, gamma+1) round blocks -> (R*(gamma+1), S)
            # chronological steps, the same harvest contract as below.
            flat = lambda a: a.swapaxes(1, 2).reshape(-1, a.shape[1])
            toks, lps, ents, emitted = map(flat, (toks, lps, ents, emitted))
            if self.collect_rauq:
                a = atts_np  # (R, L, S, H, gamma+1)
                atts = np.transpose(a, (0, 4, 1, 2, 3)).reshape(
                    -1, *a.shape[1:4]
                )  # (R*(gamma+1), L, S, H)
            else:
                atts = None
        else:
            toks, lps, ents, emitted, active_now, _ = _unpack_harvest(
                packed_np,
                (self.chunk_tokens, self.num_slots), self.num_slots,
            )
            atts = atts_np
        # Advance the host mirrors exactly as the device did: each slot's
        # clock moved by its emission count (zero for non-owned slots);
        # active is shipped back in the harvest (EOS/budget stops happen
        # device-side) but only owned slots may be overwritten — a slot
        # refilled after this chunk was dispatched keeps its host-set state.
        self.slot_pos = self.slot_pos + emitted.sum(axis=0).astype(np.int32)
        self._stats["decode_chunks"] += 1
        self._stats["tokens_emitted"] += int(emitted.sum())
        for slot in range(self.num_slots):
            req = self._slot_req[slot]
            if owners[slot] is None or req is None \
                    or req["id"] != owners[slot]:
                continue
            self.active[slot] = bool(active_now[slot])
            before = len(req["tokens"])
            for k in range(toks.shape[0]):
                if emitted[k, slot]:
                    req["tokens"].append(int(toks[k, slot]))
                    req["lps"].append(float(lps[k, slot]))
                    req["ents"].append(float(ents[k, slot]))
                    if atts is not None:
                        # copy: a view would pin the whole (K, L, S, H)
                        # chunk buffer until the request finishes
                        req["atts"].append(atts[k, :, slot, :].copy())
            # Stream exactly what the final (EOS-stripped) result will
            # contain: never yield at or past the first EOS.
            visible = len(req["tokens"])
            if self.eos_id is not None and self.eos_id in req["tokens"]:
                visible = min(visible, req["tokens"].index(self.eos_id))
            new = req["tokens"][before:visible]
            if new:
                events.append((req["id"], new))
            done = (not active_now[slot]) or (
                len(req["tokens"]) >= req["max_new"]
            )
            if done:
                self.active[slot] = False
                if self.collect_hidden is not None and hid_np is None:
                    # One (S, d) fetch covers every completion in this
                    # harvest — from THIS chunk's output handle (captured
                    # at dispatch), so completions never block on the
                    # lookahead chunk finishing.
                    hid_np = np.asarray(hid_dev)
                self._finish_slot(slot, hid_np)
        self._stats["t_sched_s"] += time.perf_counter() - t_sched
        yield from events

    def stats(self) -> dict:
        """Serving counters (host-side, zero device cost): requests
        finished, tokens emitted, decode/prefill chunk program launches,
        prefix-cache hits, and admissions deferred for a mid-prefill
        donor. Speculative engines add ``accepted``/``proposed`` draft
        counters and the derived ``acceptance`` rate (interactive drains;
        the fused drain reports its own in ``_last_fused_stats``).
        Cumulative over the engine's lifetime."""
        out = {**self._stats, "prefix_hits": self.prefix_hits}
        if out.get("proposed"):
            out["acceptance"] = round(out["accepted"] / out["proposed"], 4)
        return out

    def result(self, request_id: int) -> dict:
        return self._results[request_id]

    def clear_results(self) -> None:
        """Drop stored results. A persistent server that collects results
        after each drain calls this so the engine's result map doesn't
        grow without bound over its lifetime; ids keep monotonically
        increasing, so old ids simply become unknown."""
        self._results.clear()

    def generate_all(
        self, prompts: Sequence[Sequence[int]]
    ) -> List[Dict[str, Any]]:
        """Submit every prompt, drain the engine, return ordered results.

        The whole batch is validated BEFORE anything is enqueued: a bad
        prompt mid-list must not leave its predecessors queued in a
        persistent engine, where the next drain would silently decode them
        as ghost work."""
        for p in prompts:
            self._validate_request(list(p), None)
        ids = [self.submit(p) for p in prompts]
        self.run_until_drained()
        return [self.result(i) for i in ids]

    # -- fused offline drain ---------------------------------------------------
    def _fused_drain_fn(self, R: int, P_pad: int, M: int,
                        prefill_lanes: int = 4):
        """Jitted: drain an ENTIRE known-up-front workload in one program.

        The interactive drain loop (``stream``) pays one host round trip
        per decode chunk — on a tunneled TPU the fetch wait dominates the
        drain (measured: ~2.5 s of fetch against ~1.5 s of decode on the
        96-request bench workload), capping the engine at parity with
        static batching. When every request is known before decoding
        starts (offline batch inference), the whole scheduler fits on the
        device: a ``lax.while_loop`` whose body refills free slots from a
        device-resident queue, chunk-prefills one admitted prompt per
        iteration (``lax.cond`` branch), or decodes ``chunk_tokens`` steps
        for every active slot, scattering emissions straight into
        per-request output buffers. The host uploads the request table
        once and fetches the outputs once.

        With ``prefill_lanes=1`` greedy outputs are bit-identical to the
        interactive drain (same batch-1 chunk prefill, same decode step
        program). Wider lanes prefill several slots per weight sweep —
        faster, but the (W, C) matmul rounds bf16 differently from the
        interactive (1, C) prefill, so greedy argmax can flip on near-tie
        logits (verified on v5e: 1/24 random-weight requests diverged
        mid-sequence at lanes=4; lanes=1 is exact).
        """
        key_ = (R, P_pad, M, prefill_lanes)
        fn = self._fused_cache.get(key_)
        if fn is not None:
            return fn
        global_key = ("fused", self.model, self.draft_model, self.eos_id,
                      self.num_slots, self.prefill_chunk, self.chunk_tokens,
                      self.do_sample, self.temperature, self.top_k,
                      self.top_p, self.gamma) + key_
        fn = _cached_program(
            global_key, lambda: self._build_fused_drain(R, P_pad, M,
                                                        prefill_lanes)
        )
        self._fused_cache[key_] = fn
        return fn

    def _build_fused_drain(self, R: int, P_pad: int, M: int,
                           prefill_lanes: int):
        model, eos = self.model, self.eos_id
        S, C, K = self.num_slots, self.prefill_chunk, max(1, self.chunk_tokens)
        do_sample, temperature = self.do_sample, self.temperature
        top_k, top_p = self.top_k, self.top_p

        draft, gamma = self.draft_model, self.gamma
        use_samp = do_sample and draft is not None
        # Spec rounds per decode-branch visit: chunk_tokens keeps its
        # "approx tokens per scheduler check" meaning (emission timing
        # never changes a slot's token stream — slots are independent).
        spec_rounds = max(1, K // (gamma + 1))
        # Shared round math with the interactive _spec_chunk (fused RAUQ is
        # unsupported, so no attention gather). Only referenced when a
        # draft model selects spec_decode_branch.
        spec_round = _make_spec_round(
            model, draft, gamma, eos, use_samp, temperature
        )

        @partial(jax.jit, donate_argnums=(2, 3, 4, 5))
        def drain(params, dparams, cache, d_cache, step_logits, samp_logp,
                  req_tokens, req_len, req_budget, key):
            n_chunks = (req_len + C - 1) // C  # (R,) prefill chunks per req

            def refill(st):
                st = dict(st)
                # Vectorized queue admission: the i-th free slot (by rank
                # among free slots) takes request qh+i. No sequential scan —
                # this runs every while iteration and must cost nothing.
                free = (~st["active"]) & (st["pre_rem"] == 0)
                rank = jnp.cumsum(free.astype(jnp.int32)) - 1
                take = free & (st["qh"] + rank < R)
                r_new = jnp.clip(st["qh"] + rank, 0, R - 1)
                st["slot_req"] = jnp.where(take, r_new, st["slot_req"])
                st["write_pos"] = jnp.where(take, 0, st["write_pos"])
                st["pre_rem"] = jnp.where(
                    take, n_chunks[r_new], st["pre_rem"]
                )
                st["qh"] = st["qh"] + jnp.minimum(
                    free.sum(dtype=jnp.int32), jnp.maximum(R - st["qh"], 0)
                )
                return st

            # Prefill lanes per iteration: each lane advances one slot's
            # prefill by one chunk, so one weight sweep serves W*C prompt
            # tokens instead of C. Fewer lanes than pending slots pad by
            # DUPLICATING the first pending slot — duplicate lanes compute
            # identical rows, so the duplicate scatter writes are benign.
            W = min(prefill_lanes, S)

            def prefill_branch(st):
                st = dict(st)
                pending = st["pre_rem"] > 0
                # First W pending slot indices, padded with the first one.
                order = jnp.argsort(~pending)  # pending slots first
                first = order[0]
                lanes = jnp.where(pending[order[:W]], order[:W], first)
                r_l = st["slot_req"][lanes]  # (W,)
                w_l = st["write_pos"][lanes]
                tok = jax.vmap(
                    lambda r, w: jax.lax.dynamic_slice(
                        req_tokens[r], (w,), (C,)
                    )
                )(r_l, w_l)  # (W, C)
                rows = jax.tree_util.tree_map(
                    lambda g: g[lanes], st["cache"]
                )
                logits, _, _, rows = model.apply(params, tok, rows, w_l)
                st["cache"] = jax.tree_util.tree_map(
                    lambda g, l: g.at[lanes].set(l.astype(g.dtype)),
                    st["cache"], rows,
                )
                if draft is not None:
                    # The draft tracks the same token stream on its own
                    # cache (its KV is what the speculative rounds attend).
                    d_rows = jax.tree_util.tree_map(
                        lambda g: g[lanes], st["d_cache"]
                    )
                    d_rows = draft.apply(dparams, tok, d_rows, w_l)[3]
                    st["d_cache"] = jax.tree_util.tree_map(
                        lambda g, l: g.at[lanes].set(l.astype(g.dtype)),
                        st["d_cache"], d_rows,
                    )
                is_last = st["pre_rem"][lanes] == 1
                # Next-token logits sit at the prompt's last REAL token of
                # the final chunk (garbage past it is causally unreachable).
                last_idx = jnp.clip(req_len[r_l] - 1 - w_l, 0, C - 1)
                sel = jnp.take_along_axis(
                    logits, last_idx[:, None, None], axis=1
                )[:, 0, :]  # (W, V)
                lane_tgt = jnp.where(is_last, lanes, S)  # drop non-final
                st["step_logits"] = st["step_logits"].at[lane_tgt].set(
                    sel.astype(st["step_logits"].dtype), mode="drop"
                )
                if use_samp:
                    # Seed the slot's sampling distribution (what the first
                    # spec round draws tok0 from; later rounds replace it
                    # with the deferred Leviathan residual).
                    st["samp_logp"] = st["samp_logp"].at[lane_tgt].set(
                        jax.nn.log_softmax(sel / temperature, axis=-1),
                        mode="drop",
                    )
                fin = req_len[r_l]
                st["slot_pos"] = st["slot_pos"].at[lane_tgt].set(
                    fin, mode="drop"
                )
                st["start"] = st["start"].at[lane_tgt].set(fin, mode="drop")
                st["limit"] = st["limit"].at[lane_tgt].set(
                    fin + req_budget[r_l], mode="drop"
                )
                st["active"] = st["active"].at[lane_tgt].set(
                    True, mode="drop"
                )
                # Duplicate lanes advance their shared slot once, not W
                # times: scatter-set the same values through every lane.
                st["write_pos"] = st["write_pos"].at[lanes].set(w_l + C)
                st["pre_rem"] = st["pre_rem"].at[lanes].set(
                    st["pre_rem"][lanes] - 1
                )
                st["iters"] = st["iters"].at[0].add(1)
                return st

            def decode_branch(st):
                st = dict(st)
                slot_req, start, limit = st["slot_req"], st["start"], st["limit"]

                def body(carry, _):
                    (cache, step_logits, slot_pos, active, out_t, out_l,
                     out_e, n_emit, key) = carry
                    key, sub = jax.random.split(key)
                    log_soft = jax.nn.log_softmax(step_logits, axis=-1)
                    if do_sample:
                        from runia_core_tpu.llm.generate import sample_logits

                        next_tok = sample_logits(
                            sub, step_logits, temperature, top_k, top_p
                        )
                    else:
                        next_tok = jnp.argmax(step_logits, axis=-1)
                    lp = jnp.take_along_axis(
                        log_soft, next_tok[:, None], axis=-1
                    )[:, 0]
                    emitted = active & (slot_pos < limit)
                    next_tok = jnp.where(emitted, next_tok, 0)
                    ent = _vocab_norm_entropy(log_soft)
                    if eos is not None:
                        active = active & (next_tok != eos)
                    # Scatter emissions straight into the request buffers;
                    # non-emitting slots aim out of bounds and are dropped.
                    e_idx = jnp.where(emitted, slot_pos - start, M)
                    r_idx = jnp.where(emitted, slot_req, R)
                    out_t = out_t.at[r_idx, e_idx].set(
                        next_tok, mode="drop"
                    )
                    out_l = out_l.at[r_idx, e_idx].set(lp, mode="drop")
                    out_e = out_e.at[r_idx, e_idx].set(ent, mode="drop")
                    n_emit = n_emit.at[r_idx].set(
                        slot_pos - start + 1, mode="drop"
                    )
                    new_logits, _, _, cache = model.apply(
                        params, next_tok[:, None], cache, slot_pos
                    )
                    slot_pos = slot_pos + emitted.astype(jnp.int32)
                    active = active & (slot_pos < limit)
                    step_logits = jnp.where(
                        emitted[:, None], new_logits[:, 0, :], step_logits
                    )
                    return (cache, step_logits, slot_pos, active, out_t,
                            out_l, out_e, n_emit, key), None

                (st["cache"], st["step_logits"], st["slot_pos"],
                 st["active"], st["out_t"], st["out_l"], st["out_e"],
                 st["n_emit"], st["key"]), _ = jax.lax.scan(
                    body,
                    (st["cache"], st["step_logits"], st["slot_pos"],
                     st["active"], st["out_t"], st["out_l"], st["out_e"],
                     st["n_emit"], st["key"]),
                    None, length=K,
                )
                st["iters"] = st["iters"].at[1].add(1)
                return st

            def spec_decode_branch(st):
                """Speculative rounds with on-device scheduling: the shared
                ``_make_spec_round`` body (draft gamma proposals per slot,
                ONE (S, gamma+1) verify forward, deferred correction) with
                emissions scattered straight into the request output
                buffers. Greedy is token-identical to the interactive spec
                engine (slots' token streams are independent of emission
                timing); sampled is exact temperature rejection sampling."""
                st = dict(st)
                slot_req, start, limit = st["slot_req"], st["start"], st["limit"]
                idxs = jnp.arange(gamma + 1)[None, :]

                def round_body(carry, kj):
                    (cache, d_cache, step_logits, samp_logp, slot_pos,
                     active, out_t, out_l, out_e, n_emit, acc) = carry
                    r = spec_round(params, dparams, cache, d_cache,
                                   step_logits, samp_logp, slot_pos,
                                   active, limit, kj)
                    emit, take = r["emit"], r["take"]
                    base = slot_pos - start
                    e_idx = jnp.where(emit, base[:, None] + idxs, M)
                    r_idx = jnp.where(emit, slot_req[:, None], R)
                    out_t = out_t.at[r_idx, e_idx].set(
                        jnp.where(emit, r["block"], 0), mode="drop"
                    )
                    out_l = out_l.at[r_idx, e_idx].set(r["lps"], mode="drop")
                    out_e = out_e.at[r_idx, e_idx].set(r["ents"], mode="drop")
                    r1 = jnp.where(take > 0, slot_req, R)
                    n_emit = n_emit.at[r1].set(base + take, mode="drop")
                    acc = acc + jnp.stack([
                        jnp.sum(jnp.where(active, r["n_acc"], 0)),
                        jnp.sum(jnp.where(active, gamma, 0)),
                    ])
                    return (r["cache"], r["d_cache"], r["step_logits"],
                            r["samp_logp"], r["slot_pos"], r["active"],
                            out_t, out_l, out_e, n_emit, acc), None

                st["key"], sub = jax.random.split(st["key"])
                acc0 = jnp.zeros((2,), jnp.int32)
                (st["cache"], st["d_cache"], st["step_logits"],
                 st["samp_logp"], st["slot_pos"], st["active"], st["out_t"],
                 st["out_l"], st["out_e"], st["n_emit"], acc), _ = (
                    jax.lax.scan(
                        round_body,
                        (st["cache"], st["d_cache"], st["step_logits"],
                         st["samp_logp"], st["slot_pos"], st["active"],
                         st["out_t"], st["out_l"], st["out_e"],
                         st["n_emit"], acc0),
                        jax.random.split(sub, spec_rounds),
                    )
                )
                st["iters"] = (
                    st["iters"].at[1].add(1).at[2].add(acc[0]).at[3].add(acc[1])
                )
                return st

            dec_branch = (
                spec_decode_branch if draft is not None else decode_branch
            )

            def cond(st):
                return ~(
                    (st["qh"] >= R)
                    & ~st["active"].any()
                    & ~(st["pre_rem"] > 0).any()
                )

            def body(st):
                st = refill(st)
                return jax.lax.cond(
                    (st["pre_rem"] > 0).any(), prefill_branch, dec_branch, st
                )

            st0 = dict(
                cache=cache,
                d_cache=d_cache,
                step_logits=step_logits,
                samp_logp=samp_logp,
                slot_req=jnp.zeros((S,), jnp.int32),
                write_pos=jnp.zeros((S,), jnp.int32),
                pre_rem=jnp.zeros((S,), jnp.int32),
                slot_pos=jnp.zeros((S,), jnp.int32),
                start=jnp.zeros((S,), jnp.int32),
                limit=jnp.zeros((S,), jnp.int32),
                active=jnp.zeros((S,), bool),
                qh=jnp.zeros((), jnp.int32),
                out_t=jnp.zeros((R, M), jnp.int32),
                out_l=jnp.full((R, M), -jnp.inf, jnp.float32),
                out_e=jnp.zeros((R, M), jnp.float32),
                n_emit=jnp.zeros((R,), jnp.int32),
                # [prefill iters, decode iters, accepted, proposed]
                iters=jnp.zeros((4,), jnp.int32),
                key=key,
            )
            st = jax.lax.while_loop(cond, body, st0)
            return (st["cache"], st["d_cache"], st["step_logits"],
                    st["samp_logp"], st["out_t"], st["out_l"], st["out_e"],
                    st["n_emit"], st["iters"])

        return drain

    def generate_all_fused(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: Optional[Sequence[int]] = None,
        prefill_lanes: int = 4,
    ) -> List[Dict[str, Any]]:
        """Drain a known-up-front workload in ONE device program.

        Same results contract as :meth:`generate_all` (ordered dicts with
        ``tokens``/``log_probs``/``perplexity``/``generation_entropy``),
        but the scheduler runs on-device (see ``_fused_drain_fn``): no
        per-chunk host round trips, so offline batch throughput is bound
        by occupancy, not tunnel latency. ``max_new_tokens`` takes a
        per-request budget list (defaults to the engine budget).
        ``prefill_lanes=1`` makes greedy output bit-identical to the
        interactive drain; the wider default trades that for prefill
        throughput (see ``_fused_drain_fn`` on bf16 near-tie flips).

        Requires chunked-prefill mode. A ``draft_model`` engine drains
        with on-device speculative rounds (greedy token-identical to the
        interactive spec engine; stats gain ``accepted``/``proposed``).
        RAUQ collection and prefix caching are interactive-drain features
        and are rejected / ignored here.
        """
        if not self.prefill_chunk:
            raise ValueError("generate_all_fused requires prefill_chunk")
        if self.collect_rauq:
            raise ValueError(
                "generate_all_fused supports the plain decode path only "
                "(no RAUQ collection)"
            )
        if self.collect_hidden is not None:
            raise ValueError(
                "generate_all_fused does not stream hidden states "
                "(collect_hidden is an interactive-drain feature)"
            )
        if any(r is not None for r in self._slot_req) or self._queue:
            raise RuntimeError(
                "engine has in-flight requests; drain them before a fused run"
            )
        prompts = [list(p) for p in prompts]
        if not prompts:
            return []
        R = len(prompts)
        if max_new_tokens is None:
            budgets = [self.max_new_tokens] * R
        else:
            budgets = [int(b) for b in max_new_tokens]
            if len(budgets) != R:
                raise ValueError("one budget per prompt")
        # LPT admission (engine policy) applies to the on-device queue too:
        # longest budgets admitted first pack the drain's tail with short
        # backfills instead of one straggler slot decoding alone. The
        # device sees the reordered table; results are returned in the
        # caller's order.
        order = list(range(R))
        if self.admission == "lpt":
            order.sort(key=lambda i: -budgets[i])
            prompts = [prompts[i] for i in order]
            budgets = [budgets[i] for i in order]
        C = self.prefill_chunk
        for p, b in zip(prompts, budgets):
            if not p:
                raise ValueError("chunked prefill needs a non-empty prompt")
            if len(p) + b + self._ctx_slack > self.max_ctx:
                raise ValueError(
                    f"prompt of {len(p)} tokens + {b} new "
                    f"(+{self._ctx_slack} speculative slack) exceeds "
                    f"max_ctx={self.max_ctx}"
                )
        P_pad = -(-max(len(p) for p in prompts) // C) * C
        M = max(max(budgets), 1)

        req_tokens = np.zeros((R, P_pad), np.int32)
        for i, p in enumerate(prompts):
            req_tokens[i, : len(p)] = p
        req_len = np.asarray([len(p) for p in prompts], np.int32)
        req_budget = np.asarray(budgets, np.int32)

        self._key, sub = jax.random.split(self._key)
        fn = self._fused_drain_fn(R, P_pad, M, prefill_lanes)
        (self.cache, self.d_cache, self.step_logits, self.samp_logp,
         out_t, out_l, out_e, n_emit, iters) = fn(
            self.params, self.draft_params, self.cache, self.d_cache,
            self.step_logits, self.samp_logp,
            jnp.asarray(req_tokens), jnp.asarray(req_len),
            jnp.asarray(req_budget), sub,
        )
        iters = np.asarray(iters)
        # The fused program rewrote cache rows under its own slot schedule;
        # any prompts the interactive scheduler had marked resident are
        # gone, so prefix-cache matches against them must be invalidated
        # (a stale entry would splice unrelated KV into a new request).
        self._slot_prompt = [None] * self.num_slots
        self._last_fused_stats = {
            "prefill_iters": int(iters[0]),
            "decode_iters": int(iters[1]),
        }
        self._stats["prefill_chunks"] += int(iters[0])
        self._stats["decode_chunks"] += int(iters[1])
        if self.draft_model is not None:
            acc, prop = int(iters[2]), int(iters[3])
            self._last_fused_stats.update(
                accepted=acc, proposed=prop,
                acceptance=round(acc / prop, 4) if prop else 0.0,
            )
            # Keep stats() symmetric with the interactive drain: fused
            # draft counters fold into the same accumulators so the derived
            # acceptance rate covers ALL speculative traffic.
            self._stats["accepted"] += acc
            self._stats["proposed"] += prop
        out_t = np.asarray(out_t)
        out_l = np.asarray(out_l)
        out_e = np.asarray(out_e)
        n_emit = np.asarray(n_emit)

        results = []
        for i in range(R):
            toks = list(out_t[i, : n_emit[i]])
            lps, ents = out_l[i, : n_emit[i]], out_e[i, : n_emit[i]]
            if self.eos_id is not None and self.eos_id in toks:
                cut = toks.index(self.eos_id)
                toks, lps, ents = toks[:cut], lps[:cut], ents[:cut]
            lps = np.asarray(lps, np.float32)
            ents = np.asarray(ents, np.float32)
            results.append({
                "tokens": [int(t) for t in toks],
                "log_probs": lps,
                "prompt_length": len(prompts[i]),
                "perplexity": float(-lps.mean()) if len(toks) else float("nan"),
                "generation_entropy": (
                    float(ents.mean()) if len(toks) else float("nan")
                ),
            })
            self._stats["requests_finished"] += 1
            # Count what the device emitted (incl. any EOS token), matching
            # the interactive drain's per-harvest accounting.
            self._stats["tokens_emitted"] += int(n_emit[i])
        if self.admission == "lpt":
            undo = [0] * R
            for pos, i in enumerate(order):
                undo[i] = pos
            results = [results[undo[i]] for i in range(R)]
        return results
