"""Generation backends for the LLM uncertainty scores.

Two interchangeable backends feed ``compute_uncertainties``:

* HF torch causal LMs (duck-typed on ``.generate``): runs the reference's
  two-phase flow (deterministic + sampled generation with
  attentions/hidden_states/scores; reference scores.py:439-504) and converts
  outputs to numpy.
* :class:`JaxGenerator`: a TPU-native KV-cached decode loop over a
  runia_core_tpu.models.transformer.CausalLM, emitting HF-shaped structures
  (scores tuple, attentions tuple-of-tuples, hidden_states tuple-of-tuples)
  so every score function works identically on both backends. Multi-sample
  generation shares one batched decode with per-sequence folded RNG.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import math
import warnings

from runia_core_tpu.models.transformer import CausalLM, init_cache

__all__ = ["JaxGenerator", "run_generation", "sample_logits"]


def sample_logits(
    key: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Sample token ids from (..., V) logits — jit-safe, HF semantics.

    ``top_k=0`` and ``top_p=1.0`` disable the respective filters (HF
    generate's conventions: top-k keeps the k highest logits; nucleus keeps
    the smallest set whose cumulative probability reaches top_p, always
    including the crossing token). Filters compose: top-k applies first,
    then top-p over the survivors, then categorical sampling at
    ``temperature``. All static args, so each config is one compiled
    program — no data-dependent shapes.
    """
    logits = logits / temperature
    if top_k:
        # HF's TopKLogitsWarper clamps k to the vocab size (an HF
        # GenerationConfig materializes its default top_k=50 even when the
        # caller never set it, so small-vocab models hit top_k > V).
        top_k = min(int(top_k), logits.shape[-1])
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_desc = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_p  # cumulative BEFORE this token
        # min_tokens_to_keep=1 (HF): the top token always survives, so
        # top_p <= 0 degrades to greedy instead of masking every logit.
        keep = keep.at[..., :1].set(True)
        cutoff = jnp.min(
            jnp.where(keep, sorted_desc, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


# Compiled-program sharing across generator instances: every jitted
# program below is a pure function of the (hashable, frozen-dataclass)
# model plus decode-config scalars, so two JaxGenerators over the same
# model share one jitted callable — and one XLA compile per shape. Tests
# build fresh generators constantly; production rebuilds them per
# checkpoint. Params always ride as call ARGUMENTS, never closures.
#
# The cache is LRU-BOUNDED: pinning every program for the process
# lifetime keeps its loaded XLA executable alive, and a long test session
# accumulating hundreds of live CPU executables reproducibly segfaulted
# XLA's compiler on the NEXT compile (an unbounded-growth cliff the
# per-instance caches never hit because dead instances freed theirs).
# Live generator instances still hold their own references, so eviction
# never invalidates an in-use program — it only drops the shared handle.
from collections import OrderedDict

_PROGRAM_CACHE: "OrderedDict[tuple, Any]" = OrderedDict()
_PROGRAM_CACHE_MAX = 64


def _cached_program(key: tuple, builder):
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        fn = builder()
        _cache_put(key, fn)
    else:
        _PROGRAM_CACHE.move_to_end(key)
    return fn


def _cache_put(key: tuple, fn) -> None:
    _PROGRAM_CACHE[key] = fn
    _PROGRAM_CACHE.move_to_end(key)
    while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
        _PROGRAM_CACHE.popitem(last=False)


class JaxGenerator:
    """Stateful wrapper: CausalLM + params + decode configuration.

    ``tokenizer`` may be any object with ``encode(str) -> List[int]`` and
    ``decode(List[int]) -> str``; for synthetic tests an identity tokenizer
    suffices.
    """

    def __init__(
        self,
        model: CausalLM,
        params,
        max_new_tokens: int = 16,
        eos_id: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        use_scan: bool = True,
    ):
        self.model = model
        self.params = params
        self.max_new_tokens = max_new_tokens
        self.eos_id = eos_id
        self.use_scan = use_scan
        self._rng = rng if rng is not None else jax.random.key(0)

        # Models opting into flash attention (LlamaLM(use_flash=True)) take a
        # static assume_prefill flag so the Pallas kernel can engage on the
        # cache-filling prefill call. Flash prefill does not materialize the
        # prompt attention rows, so it is only used when the caller did not
        # ask for attentions; other models keep the plain signature.
        self._flash_model = bool(getattr(model, "use_flash", False))
        # Params are explicit jit ARGUMENTS everywhere (never closure
        # captures): a closed-over param tree is lowered into every compiled
        # program as HLO constants — at production model sizes that is
        # gigabytes of literals duplicated per program, and JAX warns
        # ("large amount of constants were captured during lowering").
        self._prefill = _cached_program(
            ("prefill", model),
            lambda: jax.jit(
                lambda p_, tokens, cache: model.apply(
                    p_, tokens, cache, jnp.int32(0)
                )
            ),
        )
        self._prefill_fast = (
            _cached_program(
                ("prefill_fast", model),
                lambda: jax.jit(
                    lambda p_, tokens, cache: model.apply(
                        p_, tokens, cache, jnp.int32(0), assume_prefill=True
                    )
                ),
            )
            if self._flash_model
            else self._prefill
        )
        self._step = _cached_program(
            ("step", model),
            lambda: jax.jit(
                lambda p_, tokens, cache, idx: model.apply(
                    p_, tokens, cache, idx
                )
            ),
        )
        self._decode_cache = {}

    def _check_context(self, total: int) -> None:
        """Warn when prompt + generation exceeds the model's trained context
        window (``model.max_len``): position embeddings index out of table
        range (CausalLM) or RoPE extrapolates untrained phases (LlamaLM)."""
        limit = getattr(self.model, "max_len", None)
        if limit and total > limit:
            warnings.warn(
                f"generation length {total} exceeds the model's trained "
                f"context window max_len={limit}; quality degrades beyond it",
                stacklevel=3,
            )

    def _scanned_decode(self, p: int, max_new: int, s: int, do_sample: bool,
                        temperature: float, out_attn: bool = True,
                        out_hid: bool = True, top_k: int = 0,
                        top_p: float = 1.0):
        """Build (and cache) the fully-fused lax.scan decode for one config.

        One compiled program runs all decode steps on device and emits the
        stacked per-step logits / tokens / log-probs / padded attention rows /
        hidden states — a single host transfer instead of one per step.
        ``out_attn``/``out_hid`` drop the corresponding stacked outputs
        (zero-size placeholders are emitted instead), which removes their
        O(T·L·S·H·total) / O(T·L·S·D) device->host transfer.
        """
        key_shape = (p, max_new, s, do_sample, float(temperature),
                     out_attn, out_hid, int(top_k), float(top_p))
        if key_shape in self._decode_cache:
            return self._decode_cache[key_shape]
        global_key = ("scan", self.model, self.eos_id,
                      self.use_scan) + key_shape
        cached = _PROGRAM_CACHE.get(global_key)
        if cached is not None:
            self._decode_cache[key_shape] = cached
            return cached
        model = self.model
        total = p + max_new
        eos = self.eos_id
        zero = jnp.zeros((), jnp.float32)

        prefill_kwargs = (
            {"assume_prefill": True} if self._flash_model and not out_attn else {}
        )

        @jax.jit
        def run(params, prompt, rng_key):
            # The s sample rows share one identical prompt (generate()
            # broadcasts it), so prefill ONCE at batch 1 and broadcast the
            # KV cache — prefill FLOPs and the prompt attention/hidden
            # device->host transfer drop by s x, bit-identically (rows are
            # independent). Decode then diverges per sample as usual.
            cache = init_cache(model, 1, total)
            logits, attn0, hiddens0, cache = model.apply(
                params, prompt[:1], cache, jnp.int32(0), **prefill_kwargs
            )
            cache = jax.tree_util.tree_map(
                lambda l: jnp.broadcast_to(l, (s,) + l.shape[1:]), cache
            )
            step_logits = jnp.broadcast_to(
                logits[:, -1, :], (s, logits.shape[-1])
            )

            def body(carry, step):
                cache, step_logits, key, finished = carry
                key, sub = jax.random.split(key)
                log_soft = jax.nn.log_softmax(step_logits, axis=-1)
                if do_sample:
                    next_tok = sample_logits(
                        sub, step_logits, temperature, top_k, top_p
                    )
                else:
                    next_tok = jnp.argmax(step_logits, axis=-1)
                lp = jnp.take_along_axis(log_soft, next_tok[:, None], axis=-1)[:, 0]
                lp = jnp.where(finished, -jnp.inf, lp)
                if eos is not None:
                    # Pad with EOS once finished — sequences past EOS would
                    # otherwise carry sampled garbage the HF backend strips.
                    next_tok = jnp.where(finished, eos, next_tok)
                    finished = finished | (next_tok == eos)

                out_logits = step_logits
                # Forward the new token (skipped after the final sample by
                # masking below — lax.scan needs uniform steps, so the last
                # forward runs but its outputs are discarded).
                new_logits, attn, hiddens, cache = model.apply(
                    params, next_tok[:, None], cache, jnp.int32(p) + step
                )
                return (
                    (cache, new_logits[:, 0, :], key, finished),
                    (
                        next_tok,
                        out_logits,
                        lp,
                        attn[:, :, :, 0, :] if out_attn else zero,
                        hiddens[:, :, 0, :] if out_hid else zero,
                    ),
                )

            init = (cache, step_logits, rng_key, jnp.zeros((s,), bool))
            _, (tokens, step_logits_seq, lps, attn_rows, hidden_rows) = jax.lax.scan(
                body, init, jnp.arange(max_new)
            )
            # tokens (T, S); step_logits_seq (T, S, V); lps (T, S);
            # attn_rows (T, L, S, H, total); hidden_rows (T, L+1, S, D)
            return (
                tokens, step_logits_seq, lps, attn_rows, hidden_rows,
                attn0 if out_attn else zero,
                hiddens0 if out_hid else zero,
            )

        self._decode_cache[key_shape] = run
        _cache_put(global_key, run)
        return run

    def generate_batch(
        self,
        prompts: Sequence[Sequence[int]],
        do_sample: bool = False,
        temperature: float = 1.0,
        key: Optional[jax.Array] = None,
        max_new_tokens: Optional[int] = None,
        pad_id: int = 0,
        output_attentions: bool = False,
        output_scores: bool = True,
        pad_to: Optional[int] = None,
        top_k: int = 0,
        top_p: float = 1.0,
    ) -> Dict[str, Any]:
        """Decode a batch of DIFFERENT prompts in one fused program.

        ``pad_to`` forces the padded prompt length to at least that many
        slots (serving: bucket lengths so jit shape-specialization reuses
        compiled programs across batches; the pad mask keeps extra slots
        inert).

        ``output_scores=False`` drops the per-step logits from the result
        (``scores`` comes back empty): the (T, B, V) logits tensor dominates
        the device->host transfer (e.g. 260 MB for 64 steps x 32 prompts x a
        32k vocab), and sequence-level scores (perplexity, generation/
        normalized entropy) only need ``log_probs`` (B, T).

        Prompts are left-padded to a common length with attention masking, so
        every sequence's last physical slot is its last real token. Returns
        sequences (B, P+T), scores (T-tuple of (B, V)), log_probs (B, T),
        prompt_lengths (B,) — the throughput path for sequence-level scores
        (perplexity / generation entropy / normalized entropy over many
        prompts). Full per-step attention/hidden taps are exposed by the
        single-prompt ``generate``.

        With ``output_attentions=True`` the result additionally carries
        ``prev_token_attention`` (B, L, H, T-1): each decode step's attention
        weight on the immediately-previous token, extracted on device inside
        the scan (the full (q, kv) attention maps never leave the chip).
        This is exactly the statistic RAUQ's "original" token aggregation
        consumes — feed it to :func:`runia_core_tpu.llm.batched_rauq`.
        Left padding does not perturb it: padded slots are masked out of the
        softmax, and every sequence's real tokens are end-aligned, so the
        previous-token column is at the same physical slot for all rows.
        """
        max_new = max_new_tokens or self.max_new_tokens
        b = len(prompts)
        lengths = np.array([len(p) for p in prompts], np.int32)
        p = int(lengths.max())
        if pad_to is not None:
            p = max(p, int(pad_to))
        tokens = np.full((b, p), pad_id, np.int32)
        valid = np.zeros((b, p), bool)
        for i, seq in enumerate(prompts):
            tokens[i, p - len(seq):] = np.asarray(seq, np.int32)
            valid[i, p - len(seq):] = True
        prompt = jnp.asarray(tokens)
        prompt_valid = jnp.asarray(valid)
        total = p + max_new
        self._check_context(total)
        if key is None:
            key = self._rng
            self._rng = jax.random.fold_in(self._rng, 1)

        model = self.model
        eos = self.eos_id
        # Uniform-length batches need no padding mask or custom positions —
        # the defaults are equivalent, and dropping them lets a use_flash
        # model run its Pallas flash prefill (flash requires the plain
        # causal case).
        uniform = bool((lengths == p).all())
        cfg = (
            "batch", b, p, max_new, do_sample, float(temperature),
            output_attentions, output_scores, uniform,
            int(top_k), float(top_p),
        )
        g_cfg = ("gbatch", model, eos) + cfg
        if cfg not in self._decode_cache and g_cfg in _PROGRAM_CACHE:
            self._decode_cache[cfg] = _PROGRAM_CACHE[g_cfg]
        if cfg not in self._decode_cache:
            flash_model = self._flash_model

            @jax.jit
            def run(params, prompt, prompt_valid, lengths, rng_key):
                cache = init_cache(model, b, total)
                if uniform:
                    prefill_kwargs = (
                        {"assume_prefill": True} if flash_model else {}
                    )
                else:
                    # Cache-mode masks span the full KV length; future slots
                    # are already excluded by the causal (q_phys) condition.
                    prefill_valid = jnp.concatenate(
                        [prompt_valid, jnp.ones((b, max_new), bool)], axis=1
                    )
                    # Logical positions of the left-padded prompt tokens.
                    prompt_positions = jnp.maximum(
                        jnp.cumsum(prompt_valid.astype(jnp.int32), axis=1) - 1, 0
                    )
                    prefill_kwargs = {
                        "token_valid": prefill_valid,
                        "positions": prompt_positions,
                    }
                logits, _, _, cache = model.apply(
                    params, prompt, cache, jnp.int32(0), **prefill_kwargs
                )
                step_logits = logits[:, -1, :]

                def body(carry, step):
                    cache, step_logits, key_, finished = carry
                    key_, sub = jax.random.split(key_)
                    log_soft = jax.nn.log_softmax(step_logits, axis=-1)
                    if do_sample:
                        next_tok = sample_logits(
                            sub, step_logits, temperature, top_k, top_p
                        )
                    else:
                        next_tok = jnp.argmax(step_logits, axis=-1)
                    lp = jnp.take_along_axis(log_soft, next_tok[:, None], axis=-1)[:, 0]
                    lp = jnp.where(finished, -jnp.inf, lp)
                    if eos is not None:
                        next_tok = jnp.where(finished, eos, next_tok)
                        finished = finished | (next_tok == eos)
                    # Physical KV validity: padded prompt slots masked, all
                    # generated slots (up to the cache) valid.
                    gen_valid = jnp.arange(max_new)[None, :] <= step
                    kv_valid = jnp.concatenate(
                        [prompt_valid, jnp.broadcast_to(gen_valid, (b, max_new))],
                        axis=1,
                    )
                    positions = (lengths + step)[:, None]
                    new_logits, attn, _, cache = model.apply(
                        params, next_tok[:, None], cache, jnp.int32(p) + step,
                        token_valid=kv_valid, positions=positions,
                    )
                    if output_attentions:
                        # attn (L, B, H, 1, total): keep only the column for
                        # the previous token (physical slot p+step-1 — the
                        # last prompt token at step 0, else the previous
                        # generated token), matching the single-prompt
                        # _get_recurent_attention extraction.
                        prev = jax.lax.dynamic_slice_in_dim(
                            attn[:, :, :, 0, :], jnp.int32(p - 1) + step, 1, axis=-1
                        )[..., 0]
                    else:
                        prev = jnp.zeros((), jnp.float32)
                    emitted_logits = (
                        step_logits if output_scores else jnp.zeros((), jnp.float32)
                    )
                    return (
                        (cache, new_logits[:, 0, :], key_, finished),
                        (next_tok, emitted_logits, lp, prev),
                    )

                init = (cache, step_logits, rng_key, jnp.zeros((b,), bool))
                _, (toks, score_seq, lps, prev_attn) = jax.lax.scan(
                    body, init, jnp.arange(max_new)
                )
                return toks, score_seq, lps, prev_attn

            self._decode_cache[cfg] = run
            _cache_put(g_cfg, run)
        toks, score_seq, lps, prev_attn = jax.tree_util.tree_map(
            np.asarray,
            self._decode_cache[cfg](
                self.params, prompt, prompt_valid, jnp.asarray(lengths), key
            ),
        )
        sequences = np.concatenate([tokens, toks.T], axis=1)
        result = {
            "sequences": sequences,
            "scores": (
                tuple(score_seq[i] for i in range(max_new))
                if output_scores
                else ()
            ),
            "log_probs": lps.T,
            "prompt_lengths": lengths,
        }
        if output_attentions:
            # (T, L, B, H) -> (B, L, H, T-1); the final step's forward output
            # is discarded exactly as in the single-prompt path (its token is
            # never consumed by a subsequent step).
            result["prev_token_attention"] = np.transpose(
                prev_attn[: max_new - 1], (2, 1, 3, 0)
            )
        return result

    def generate(
        self,
        prompt_tokens: Sequence[int],
        num_return_sequences: int = 1,
        do_sample: bool = False,
        temperature: float = 1.0,
        key: Optional[jax.Array] = None,
        max_new_tokens: Optional[int] = None,
        output_attentions: bool = True,
        output_hidden_states: bool = True,
        top_k: int = 0,
        top_p: float = 1.0,
    ) -> Dict[str, Any]:
        """Decode with per-step taps; returns HF-shaped numpy structures.

        Returns dict with keys: sequences (S, P+T), scores (tuple of (S, V)),
        attentions (tuple over steps of per-layer (S, H, tgt, src)),
        hidden_states (tuple over steps of per-layer (S, tgt, D)),
        log_probs (S, T) transition log-probabilities. Disabling
        ``output_attentions``/``output_hidden_states`` returns empty tuples
        for those keys and skips their device->host transfer (the HF flags
        of the same names, inverted default).

        The PROMPT step's attentions/hidden_states (index 0) are read-only
        views whose S rows alias one buffer — the samples share the prompt,
        so the prompt pass runs once at batch 1 and is re-broadcast here
        (mutating a row in place would invisibly mutate all rows; NumPy's
        read-only flag turns that bug into an error). Copy before writing.
        """
        max_new = max_new_tokens or self.max_new_tokens
        s = num_return_sequences
        prompt = jnp.asarray(np.asarray(prompt_tokens, dtype=np.int32))[None, :]
        prompt = jnp.broadcast_to(prompt, (s, prompt.shape[1]))
        p = prompt.shape[1]
        total = p + max_new
        self._check_context(total)
        if key is None:
            key = self._rng
            self._rng = jax.random.fold_in(self._rng, 1)

        if self.use_scan:
            run = self._scanned_decode(
                p, max_new, s, do_sample, temperature,
                out_attn=output_attentions, out_hid=output_hidden_states,
                top_k=top_k, top_p=top_p,
            )
            tokens, scores_seq, lps, attn_rows, hidden_rows, attn0, hiddens0 = (
                jax.tree_util.tree_map(np.asarray, run(self.params, prompt, key))
            )
            attentions = []
            hidden_states = []
            # The prompt pass ran at batch 1 (samples share the prompt);
            # re-broadcast to S rows host-side. The rows are read-only
            # views aliasing one buffer — identical by construction.
            if output_attentions:
                attentions.append(
                    tuple(
                        np.broadcast_to(
                            attn0[l, :, :, :, :p],
                            (s,) + attn0.shape[2:4] + (p,),
                        )
                        for l in range(attn0.shape[0])
                    )
                )
            if output_hidden_states:
                hidden_states.append(
                    tuple(
                        np.broadcast_to(h, (s,) + h.shape[1:]) for h in hiddens0
                    )
                )
            for step in range(max_new - 1):
                src_len = p + step + 1
                if output_attentions:
                    attentions.append(
                        tuple(
                            attn_rows[step, l, :, :, None, :src_len]
                            for l in range(attn_rows.shape[1])
                        )
                    )
                if output_hidden_states:
                    hidden_states.append(
                        tuple(
                            hidden_rows[step, l][:, None, :]
                            for l in range(hidden_rows.shape[1])
                        )
                    )
            sequences = np.concatenate([np.asarray(prompt), tokens.T], axis=1)
            return {
                "sequences": sequences,
                "scores": tuple(scores_seq[i] for i in range(max_new)),
                "attentions": tuple(attentions),
                "hidden_states": tuple(hidden_states),
                "log_probs": lps.T,
            }

        cache = init_cache(self.model, s, total)
        prefill = self._prefill if output_attentions else self._prefill_fast
        logits, attn, hiddens, cache = prefill(self.params, prompt, cache)
        # attn: (L, S, H, P, total) in cache mode -> trim to (S, H, P, P)
        attentions: List[Tuple[np.ndarray, ...]] = []
        hidden_states: List[Tuple[np.ndarray, ...]] = []
        if output_attentions:
            attentions.append(
                tuple(np.asarray(attn[l, :, :, :, :p]) for l in range(attn.shape[0]))
            )
        if output_hidden_states:
            hidden_states.append(tuple(np.asarray(h) for h in hiddens))
        scores: List[np.ndarray] = []
        token_ids: List[np.ndarray] = []
        log_probs: List[np.ndarray] = []

        step_logits = logits[:, -1, :]  # (S, V)
        finished = np.zeros(s, dtype=bool)
        for step in range(max_new):
            log_soft = jax.nn.log_softmax(step_logits, axis=-1)
            if do_sample:
                key, sub = jax.random.split(key)
                next_tok = sample_logits(sub, step_logits, temperature,
                                         top_k, top_p)
            else:
                next_tok = jnp.argmax(step_logits, axis=-1)
            scores.append(np.asarray(step_logits))
            lp = np.asarray(
                jnp.take_along_axis(log_soft, next_tok[:, None], axis=-1)
            )[:, 0]
            lp = np.where(finished, -np.inf, lp)
            log_probs.append(lp)
            if self.eos_id is not None:
                # Pad with EOS once finished (post-EOS sampled tokens would
                # otherwise reach the decoded texts; HF strips them).
                next_tok = jnp.where(jnp.asarray(finished), self.eos_id, next_tok)
            token_ids.append(np.asarray(next_tok))
            if self.eos_id is not None:
                finished |= np.asarray(next_tok) == self.eos_id

            if step == max_new - 1:
                break
            idx = jnp.int32(p + step)
            step_out, attn, hiddens, cache = self._step(
                self.params, next_tok[:, None], cache, idx
            )
            src_len = p + step + 1
            if output_attentions:
                attentions.append(
                    tuple(np.asarray(attn[l, :, :, :, :src_len]) for l in range(attn.shape[0]))
                )
            if output_hidden_states:
                hidden_states.append(tuple(np.asarray(h) for h in hiddens))
            step_logits = step_out[:, 0, :]

        sequences = np.concatenate(
            [np.asarray(prompt)] + [t[:, None] for t in token_ids], axis=1
        )
        return {
            "sequences": sequences,
            "scores": tuple(scores),
            "attentions": tuple(attentions),
            "hidden_states": tuple(hidden_states),
            "log_probs": np.stack(log_probs, axis=1),
        }


# ---------------------------------------------------------------------------
# Backend dispatch for compute_uncertainties
# ---------------------------------------------------------------------------
def _hf_generation(model, tokenizer, prompt, gen_config, num_samples, needs_sampling):
    """Reference-equivalent HF flow (scores.py:426-504), outputs numpy-ized."""
    inputs = tokenizer(prompt, return_tensors="pt")
    if hasattr(model, "device"):
        inputs = inputs.to(model.device)
    input_length = inputs["input_ids"].shape[1]

    det_out = model.generate(
        **inputs,
        generation_config=gen_config,
        output_attentions=True,
        output_hidden_states=True,
        output_scores=True,
        return_dict_in_generate=True,
    )
    deterministic_text = tokenizer.batch_decode(
        det_out.sequences[:, input_length:], skip_special_tokens=True
    )
    det_log_probs = model.compute_transition_scores(
        det_out.sequences, det_out.scores, normalize_logits=True
    )
    deterministic = {
        "log_probs": np.asarray(det_log_probs.cpu()),
        "logits": det_out.scores,
        "attentions": det_out.attentions,
        "input_length": input_length,
        "text": deterministic_text,
    }

    sampled = {"log_probs": None, "hidden_states": None, "texts": None}
    if needs_sampling:
        samp_out = model.generate(
            **inputs,
            do_sample=True,
            temperature=1.0,
            num_return_sequences=num_samples,
            generation_config=gen_config,
            output_attentions=True,
            output_hidden_states=True,
            output_scores=True,
            return_dict_in_generate=True,
        )
        sampled = {
            "log_probs": np.asarray(
                model.compute_transition_scores(
                    samp_out.sequences, samp_out.scores, normalize_logits=True
                ).cpu()
            ),
            "hidden_states": samp_out.hidden_states,
            "texts": tokenizer.batch_decode(
                samp_out.sequences[:, input_length:], skip_special_tokens=True
            ),
        }
    return deterministic, sampled, deterministic_text


def _strip_eos(ids, eos_id):
    """Drop EOS and everything after it (HF skip_special_tokens parity)."""
    if eos_id is None:
        return list(ids)
    out = []
    for t in ids:
        if t == eos_id:
            break
        out.append(t)
    return out


def _sampling_kwargs(gen_config) -> Dict[str, Any]:
    """Extract the sampling knobs JaxGenerator honors from an HF-style
    GenerationConfig (object or dict): temperature, top_k, top_p. Other
    fields (beam search, penalties) are not supported on the JAX backends
    and are ignored, as documented on each backend."""
    if gen_config is None:
        return {}
    if isinstance(gen_config, dict):
        get = gen_config.get
    else:
        get = lambda k, d=None: getattr(gen_config, k, d)
    kw: Dict[str, Any] = {}
    if get("temperature") is not None:
        kw["temperature"] = float(get("temperature"))
    if get("top_k") is not None:
        kw["top_k"] = int(get("top_k"))
    if get("top_p") is not None:
        kw["top_p"] = float(get("top_p"))
    return kw


def _jax_generation(generator, tokenizer, prompt, gen_config, num_samples,
                    needs_sampling, needs_attentions=True, needs_hiddens=True):
    """JaxGenerator flow mirroring the two HF phases.

    The deterministic pass is greedy (as in the reference); the sampled
    pass honors ``gen_config``'s temperature/top_k/top_p via
    :func:`_sampling_kwargs` (beam-search and penalty fields are ignored).

    ``needs_attentions`` gates the deterministic pass's attention taps (only
    RAUQ reads them) and ``needs_hiddens`` the sampled pass's hidden states
    (only eigen_score reads them) — skipping unneeded taps removes their
    device->host transfer.
    """
    if tokenizer is not None and hasattr(tokenizer, "encode"):
        prompt_tokens = tokenizer.encode(prompt)
    else:
        prompt_tokens = prompt  # already token ids
    det = generator.generate(
        prompt_tokens, num_return_sequences=1, do_sample=False,
        output_attentions=needs_attentions, output_hidden_states=False,
    )
    input_length = len(prompt_tokens)
    eos_id = generator.eos_id
    det_ids = _strip_eos(det["sequences"][0, input_length:].tolist(), eos_id)
    if tokenizer is not None and hasattr(tokenizer, "decode"):
        deterministic_text = [tokenizer.decode(det_ids)]
    else:
        deterministic_text = [det_ids]
    deterministic = {
        "log_probs": det["log_probs"],
        "logits": det["scores"],
        "attentions": det["attentions"],
        "input_length": input_length,
        "text": deterministic_text,
    }
    sampled = {"log_probs": None, "hidden_states": None, "texts": None}
    if needs_sampling:
        samp = generator.generate(
            prompt_tokens, num_return_sequences=num_samples, do_sample=True,
            output_attentions=False, output_hidden_states=needs_hiddens,
            **_sampling_kwargs(gen_config),
        )
        samp_ids = [
            _strip_eos(samp["sequences"][i, input_length:].tolist(), eos_id)
            for i in range(num_samples)
        ]
        if tokenizer is not None and hasattr(tokenizer, "decode"):
            texts = [tokenizer.decode(ids) for ids in samp_ids]
        else:
            texts = samp_ids
        sampled = {
            "log_probs": samp["log_probs"],
            "hidden_states": samp["hidden_states"],
            "texts": texts,
        }
    return deterministic, sampled, deterministic_text


def validate_generation_request(model, needs_sampling, needs_hiddens) -> None:
    """Raise backend-capability errors BEFORE any decode work.

    ``compute_uncertainties`` calls this on the full request list so that an
    unsatisfiable request (e.g. eigen_score on a SpeculativeGenerator, whose
    fused loop emits no hidden states) fails immediately instead of after the
    deterministic pass has already run."""
    from runia_core_tpu.llm.speculative import SpeculativeGenerator

    if isinstance(model, SpeculativeGenerator):
        if needs_sampling and needs_hiddens:
            raise ValueError(
                "eigen_score needs sampled hidden states, which the fused "
                "speculative loop does not emit — pass a JaxGenerator instead"
            )
        if needs_sampling and not model.do_sample:
            raise ValueError(
                "sampled uncertainty scores need SpeculativeGenerator("
                "do_sample=True)"
            )


def _speculative_generation(spec, tokenizer, prompt, gen_config, num_samples,
                            needs_sampling, needs_attentions=True,
                            needs_hiddens=True):
    """SpeculativeGenerator backend: deterministic pass through a plain
    JaxGenerator on the TARGET model (so attention taps for RAUQ are
    available), sampled pass through the fused speculative loop (~5x the
    plain N-sample decode — docs/PERFORMANCE.md). Hidden states are not
    emitted by the fused loop, so eigen_score must use a JaxGenerator.

    Note: as on all JAX backends, ``gen_config`` is ignored here — sampling
    settings (temperature/do_sample) come from the SpeculativeGenerator's
    construction, not from a caller-supplied HF GenerationConfig. A
    gen_config whose knobs CONFLICT with the generator's settings triggers
    a warning so the silent override is visible."""
    validate_generation_request(spec, needs_sampling, needs_hiddens)
    requested = _sampling_kwargs(gen_config)
    if needs_sampling and requested:
        conflicts = []
        if "temperature" in requested and not math.isclose(
            requested["temperature"], spec.temperature, rel_tol=1e-6
        ):
            conflicts.append(
                f"temperature={requested['temperature']} "
                f"(generator uses {spec.temperature})"
            )
        for k in ("top_k", "top_p"):
            if k in requested:
                conflicts.append(f"{k}={requested[k]} (unsupported on the "
                                 "speculative backend)")
        if conflicts:
            warnings.warn(
                "gen_config is ignored on the speculative backend; "
                "conflicting settings: " + ", ".join(conflicts),
                stacklevel=3,
            )
    det_gen = getattr(spec, "_uncertainty_det_gen", None)
    if det_gen is None:
        det_gen = JaxGenerator(
            spec.target, spec.target_params,
            max_new_tokens=spec.max_new_tokens, eos_id=spec.eos_id,
        )
        spec._uncertainty_det_gen = det_gen
    deterministic, _, deterministic_text = _jax_generation(
        det_gen, tokenizer, prompt, gen_config, 1, needs_sampling=False,
        needs_attentions=needs_attentions, needs_hiddens=False,
    )

    sampled = {"log_probs": None, "hidden_states": None, "texts": None}
    if needs_sampling:
        if tokenizer is not None and hasattr(tokenizer, "encode"):
            prompt_tokens = tokenizer.encode(prompt)
        else:
            prompt_tokens = prompt
        samp = spec.generate_samples(prompt_tokens, num_samples)
        ids = [
            _strip_eos(
                samp["tokens"][i, : int(samp["lengths"][i])].tolist(),
                spec.eos_id,
            )
            for i in range(num_samples)
        ]
        if tokenizer is not None and hasattr(tokenizer, "decode"):
            texts = [tokenizer.decode(t) for t in ids]
        else:
            texts = ids
        sampled = {
            "log_probs": samp["log_probs"],  # -inf past each sample's end
            "hidden_states": None,
            "texts": texts,
        }
    return deterministic, sampled, deterministic_text


def run_generation(model, tokenizer, prompt, gen_config, num_samples,
                   needs_sampling, needs_attentions=True, needs_hiddens=True):
    """Dispatch on backend type. The ``needs_*`` hints only prune taps on the
    JAX backend; the HF flow always requests everything (reference parity)."""
    from runia_core_tpu.llm.speculative import SpeculativeGenerator

    if isinstance(model, JaxGenerator):
        return _jax_generation(
            model, tokenizer, prompt, gen_config, num_samples, needs_sampling,
            needs_attentions=needs_attentions, needs_hiddens=needs_hiddens,
        )
    if isinstance(model, SpeculativeGenerator):
        return _speculative_generation(
            model, tokenizer, prompt, gen_config, num_samples, needs_sampling,
            needs_attentions=needs_attentions, needs_hiddens=needs_hiddens,
        )
    if hasattr(model, "generate"):
        return _hf_generation(
            model, tokenizer, prompt, gen_config, num_samples, needs_sampling
        )
    raise TypeError(f"Unsupported generation backend: {type(model)}")
