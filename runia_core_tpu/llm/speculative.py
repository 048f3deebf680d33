"""Speculative decoding: a small draft model proposes, the target verifies.

Capability the reference cannot express (its LLM path is HF ``generate``
over one torch model, runia_core/llm_uncertainty/scores.py:439-456); this is
the standard production-serving accelerator for the TPU-native decode path:
each round the draft model emits ``gamma`` greedy tokens autoregressively,
then ONE target forward scores all of them (gamma+1 positions) and the
longest agreeing prefix plus the target's correction token are accepted —
so the expensive model runs once per ``n_accepted + 1`` tokens instead of
once per token. With greedy acceptance the output matches plain greedy
decoding of the target exactly, up to f32/bf16 argmax near-ties between the
batched verify forward and sequential 1-token forwards (XLA reassociates
the sums differently; tests pin exact equality on fixed f32 seeds).

TPU-native structure: the ENTIRE generation — draft scans, verify forwards,
acceptance bookkeeping, early exit — runs as one compiled program
(``lax.while_loop``), so there are zero host round-trips per round (a
host-driven loop pays one RTT per round, which over a tunneled link costs
more than the compute it saves). Cache bookkeeping: both KV caches are
written optimistically during speculation; rejected slots are simply left
stale — the causal q_phys mask (models/llama.py, models/transformer.py)
ignores slots beyond the current index, and sequential writes overwrite
them later. Rewind is therefore free (an index decrement, no cache
surgery). One slot is NOT covered by that argument: after a fully-accepted
round the last proposal's position is behind the new index but was never
consumed by the draft — the draft scan runs one extra step purely to write
that K/V (a zero there silently halves the acceptance rate).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.models.transformer import init_cache

__all__ = ["SpeculativeGenerator", "speculative_sample_round"]


def speculative_sample_round(proposals, draft_probs, target_probs, key):
    """One rejection-sampling verify round (Leviathan et al. scheme).

    proposals: (g,) draft-sampled tokens; draft_probs: (g, V) the draft's
    sampling distributions; target_probs: (g+1, V) the target's
    distributions at every position of the verify forward. Accept proposal
    i with prob min(1, p_t/p_d); at the first rejection sample from the
    residual max(p_t - p_d, 0) (renormalized), and if everything is
    accepted sample the bonus token from the target's last distribution.
    The emitted tokens are then EXACT samples from the target distribution
    — the draft only changes how many come per target forward.

    Returns (n_acc, emitted (g+1,)); emitted[i] is valid for i <= n_acc.
    """
    g = proposals.shape[0]
    ku, kc = jax.random.split(key)
    p_t_prop = jnp.take_along_axis(
        target_probs[:-1], proposals[:, None], axis=-1
    )[:, 0]
    p_d_prop = jnp.take_along_axis(draft_probs, proposals[:, None], axis=-1)[:, 0]
    u = jax.random.uniform(ku, (g,))
    accept = u < jnp.minimum(1.0, p_t_prop / jnp.maximum(p_d_prop, 1e-20))
    agree = jnp.cumprod(accept.astype(jnp.int32))
    n_acc = jnp.sum(agree)
    # Residual at the rejection position (draft probs extended with a zero
    # row for the all-accepted bonus position: residual = p_t there).
    draft_ext = jnp.concatenate(
        [draft_probs, jnp.zeros_like(target_probs[-1:])], axis=0
    )
    residual = jnp.maximum(target_probs[n_acc] - draft_ext[n_acc], 0.0)
    residual = jnp.where(
        jnp.sum(residual) > 0, residual, target_probs[n_acc]
    )
    correction = jax.random.categorical(kc, jnp.log(residual + 1e-30))
    idxs = jnp.arange(g + 1)
    emitted = jnp.where(
        idxs < n_acc,
        jnp.concatenate([proposals, proposals[-1:]]),
        jnp.full((g + 1,), correction, proposals.dtype),
    )
    return n_acc, emitted.astype(jnp.int32)


class SpeculativeGenerator:
    """Greedy speculative decoding over two models sharing one vocabulary.

    ``target``/``draft`` follow the CausalLM model contract (LlamaLM or
    CausalLM). Worst case (every proposal rejected) each round still emits
    the target's correction token, so cost is bounded by one target forward
    plus ``gamma`` draft steps per token; best case (gamma+1) tokens per
    target forward.
    """

    def __init__(self, target, target_params, draft, draft_params,
                 gamma: int = 4, max_new_tokens: int = 16,
                 eos_id: Optional[int] = None, do_sample: bool = False,
                 temperature: float = 1.0):
        self.target, self.target_params = target, target_params
        self.draft, self.draft_params = draft, draft_params
        self.gamma = int(gamma)
        self.max_new_tokens = max_new_tokens
        self.eos_id = eos_id
        self.do_sample = bool(do_sample)
        self.temperature = float(temperature)
        self._run_cache: Dict[int, Any] = {}
        self._rng = jax.random.key(0)

    def _next_key(self, key: Optional[jax.Array]) -> jax.Array:
        """Explicit key wins; otherwise advance the internal stream so
        repeated sampled calls yield DIFFERENT continuations (matching
        JaxGenerator's per-call rng fold)."""
        if key is not None:
            return key
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _warn_context(self, p: int) -> None:
        limit = getattr(self.target, "max_len", None)
        if limit and p + self.max_new_tokens > limit:
            import warnings

            warnings.warn(
                f"generation length {p + self.max_new_tokens} exceeds the "
                f"target's trained context window max_len={limit}; quality "
                "degrades beyond it",
                stacklevel=3,
            )

    def _build_run(self, p: int):
        # Param trees enter the jitted program as ARGUMENTS (tp/dp below),
        # never closure captures — closed-over arrays are lowered into the
        # executable as HLO constants, which at production model sizes means
        # gigabytes of literals per compiled program.
        target, draft = self.target, self.draft
        gamma, max_new, eos = self.gamma, self.max_new_tokens, self.eos_id
        do_sample, temp = self.do_sample, self.temperature
        total = p + max_new + gamma + 1  # slack for the last round
        buf_len = max_new + gamma + 1
        t_prefill_kwargs = (
            {"assume_prefill": True} if getattr(target, "use_flash", False) else {}
        )
        d_prefill_kwargs = (
            {"assume_prefill": True} if getattr(draft, "use_flash", False) else {}
        )

        @jax.jit
        def run(tp, dp, prompt, rng_key):
            t_cache = init_cache(target, 1, total)
            d_cache = init_cache(draft, 1, total)
            logits, _, _, t_cache = target.apply(
                tp, prompt, t_cache, jnp.int32(0), **t_prefill_kwargs
            )
            d_cache = draft.apply(
                dp, prompt, d_cache, jnp.int32(0), **d_prefill_kwargs
            )[3]
            rng_key, k0 = jax.random.split(rng_key)
            if do_sample:
                last = jax.random.categorical(
                    k0, logits[:, -1, :] / temp, axis=-1
                ).astype(jnp.int32)
            else:
                last = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            first_lp = jax.nn.log_softmax(logits[0, -1, :])[last[0]]

            buf = jnp.zeros((buf_len,), jnp.int32).at[0].set(last[0])
            lpb = jnp.zeros((buf_len,), jnp.float32).at[0].set(first_lp)
            finished = (
                (last[0] == eos) if eos is not None else jnp.asarray(False)
            )
            state = (t_cache, d_cache, last, jnp.int32(p), jnp.int32(1),
                     buf, lpb, finished, jnp.int32(0), jnp.int32(0), rng_key)

            def cond(s):
                return (s[4] < max_new) & ~s[7]

            def body(s):
                (t_cache, d_cache, last, index, n_gen, buf, lpb, fin,
                 rounds, accepted, key) = s
                key, k_draft, k_round = jax.random.split(key, 3)

                def draft_step(carry, k):
                    tok, dc, idx = carry
                    lg, _, _, dc = draft.apply(dp, tok[:, None], dc, idx)
                    row = lg[0, 0, :] / temp
                    if do_sample:
                        nxt = jax.random.categorical(k, row[None, :], axis=-1)
                    else:
                        nxt = jnp.argmax(row[None, :], axis=-1)
                    return (nxt.astype(jnp.int32), dc, idx + 1), (
                        nxt[0].astype(jnp.int32), jax.nn.softmax(row)
                    )

                # gamma+1 steps: the extra step consumes the LAST proposal so
                # its K/V lands in the draft cache — without it, a fully
                # accepted round leaves a permanent zero-K/V hole at slot
                # index+gamma that poisons every later draft forward (the
                # extra step's own sampled token is discarded).
                (_, d_cache, _), (proposals_x, draft_probs_x) = jax.lax.scan(
                    draft_step, (last, d_cache, index),
                    jax.random.split(k_draft, gamma + 1),
                )
                proposals = proposals_x[:gamma]
                draft_probs = draft_probs_x[:gamma]

                block = jnp.concatenate([last, proposals])[None, :]
                lg, _, _, t_cache = target.apply(tp, block, t_cache, index)
                logp = jax.nn.log_softmax(lg[0], axis=-1)
                idxs = jnp.arange(gamma + 1)
                if do_sample:
                    target_probs = jax.nn.softmax(lg[0] / temp, axis=-1)
                    n_acc, emitted = speculative_sample_round(
                        proposals, draft_probs, target_probs, k_round
                    )
                else:
                    preds = jnp.argmax(lg[0], axis=-1).astype(jnp.int32)
                    agree = jnp.cumprod(
                        (proposals == preds[:-1]).astype(jnp.int32)
                    )
                    n_acc = jnp.sum(agree)
                    emitted = jnp.where(
                        idxs < n_acc,
                        jnp.concatenate([proposals, proposals[-1:]]),
                        preds[jnp.minimum(idxs, n_acc)],
                    )
                tok_lp = jnp.take_along_axis(logp, emitted[:, None], axis=-1)[:, 0]

                cand = n_acc + 1
                if eos is not None:
                    in_range = idxs < cand
                    is_eos = (emitted == eos) & in_range
                    has_eos = jnp.any(is_eos)
                    cand = jnp.where(has_eos, jnp.argmax(is_eos) + 1, cand)
                    fin = fin | has_eos
                take = jnp.minimum(cand, max_new - n_gen)
                # Writes start at the first unwritten slot; entries past
                # `take` are slack and overwritten by later rounds.
                buf = jax.lax.dynamic_update_slice(buf, emitted, (n_gen,))
                lpb = jax.lax.dynamic_update_slice(lpb, tok_lp, (n_gen,))
                n_gen = n_gen + take
                last = jax.lax.dynamic_slice(buf, (n_gen - 1,), (1,))
                return (t_cache, d_cache, last, index + n_acc + 1, n_gen,
                        buf, lpb, fin, rounds + 1, accepted + n_acc, key)

            final = jax.lax.while_loop(cond, body, state)
            return final[5], final[6], final[4], final[8], final[9]

        return run

    def generate_samples(self, prompt_tokens: Sequence[int],
                         num_samples: int,
                         key: Optional[jax.Array] = None) -> Dict[str, Any]:
        """N sampled continuations of one prompt — vmapped fused loops.

        The reference's multi-sample uncertainty pattern (N sampled
        generations feeding normalized/semantic entropy and eigen-score,
        runia_core/llm_uncertainty/scores.py:478-504) with speculative
        acceleration: vmap batches every per-sample while_loop (JAX runs
        rounds until all samples finish; each sample's cache index advances
        independently). Requires ``do_sample=True``.

        Returns sequences (N, P+T_max) (right-padded with the last token),
        tokens (N, T_max), log_probs (N, T_max) (-inf past each sample's
        end), lengths (N,), acceptance_rate.
        """
        if not self.do_sample:
            raise ValueError("generate_samples requires do_sample=True")
        prompt = jnp.asarray(np.asarray(prompt_tokens, np.int32))[None, :]
        p = prompt.shape[1]
        self._warn_context(p)
        if p not in self._run_cache:
            self._run_cache[p] = self._build_run(p)
        run = self._run_cache[p]
        keys = jax.random.split(self._next_key(key), num_samples)
        buf, lpb, n_gen, rounds, accepted = jax.tree_util.tree_map(
            np.asarray,
            jax.vmap(run, in_axes=(None, None, None, 0))(
                self.target_params, self.draft_params, prompt, keys
            ),
        )
        t_max = int(n_gen.max())
        mask = np.arange(t_max)[None, :] < n_gen[:, None]
        last_tok = buf[np.arange(len(n_gen)), n_gen - 1]
        tokens = np.where(mask, buf[:, :t_max], last_tok[:, None])
        lps = np.where(mask, lpb[:, :t_max], -np.inf)
        seqs = np.concatenate(
            [np.repeat(np.asarray(prompt), num_samples, axis=0),
             tokens], axis=1,
        )
        total_rounds = int(rounds.sum())
        return {
            "sequences": seqs,
            "tokens": tokens,
            "log_probs": lps,
            "lengths": n_gen,
            "acceptance_rate": float(accepted.sum())
            / max(1, total_rounds * self.gamma),
        }

    def generate_prompts(self, prompts: Sequence[Sequence[int]],
                         key: Optional[jax.Array] = None) -> Dict[str, Any]:
        """B equal-length prompts decoded in parallel — the same vmap as
        ``generate_samples`` but over prompts (serving batch shape). For
        ragged prompt lengths use JaxGenerator.generate_batch (left-padded
        masking) — the fused speculative loop requires the plain causal
        case."""
        lens = {len(p) for p in prompts}
        if len(lens) != 1:
            raise ValueError(
                f"generate_prompts requires equal-length prompts, got {sorted(lens)}"
            )
        p = lens.pop()
        batch = jnp.asarray(np.asarray(prompts, np.int32))[:, None, :]  # (B,1,p)
        if p not in self._run_cache:
            self._run_cache[p] = self._build_run(p)
        self._warn_context(p)
        keys = jax.random.split(self._next_key(key), len(prompts))
        buf, lpb, n_gen, rounds, accepted = jax.tree_util.tree_map(
            np.asarray,
            jax.vmap(self._run_cache[p], in_axes=(None, None, 0, 0))(
                self.target_params, self.draft_params, batch, keys
            ),
        )
        t_max = int(n_gen.max())
        mask = np.arange(t_max)[None, :] < n_gen[:, None]
        last_tok = buf[np.arange(len(n_gen)), n_gen - 1]
        tokens = np.where(mask, buf[:, :t_max], last_tok[:, None])
        lps = np.where(mask, lpb[:, :t_max], -np.inf)
        return {
            "sequences": np.concatenate([np.asarray(batch[:, 0]), tokens], axis=1),
            "tokens": tokens,
            "log_probs": lps,
            "lengths": n_gen,
            "acceptance_rate": float(accepted.sum())
            / max(1, int(rounds.sum()) * self.gamma),
        }

    def generate(self, prompt_tokens: Sequence[int],
                 key: Optional[jax.Array] = None) -> Dict[str, Any]:
        """Decode (greedy or sampled per the constructor flags); one fused
        device program for the whole generation.

        Returns sequences (1, P+T), tokens (T,), log_probs (T,) — the
        target's log-probs of the emitted tokens — plus rounds and
        acceptance_rate diagnostics.
        """
        prompt = jnp.asarray(np.asarray(prompt_tokens, np.int32))[None, :]
        p = prompt.shape[1]
        self._warn_context(p)
        if p not in self._run_cache:
            self._run_cache[p] = self._build_run(p)
        buf, lpb, n_gen, rounds, accepted = jax.tree_util.tree_map(
            np.asarray,
            self._run_cache[p](
                self.target_params, self.draft_params, prompt,
                self._next_key(key),
            ),
        )
        n = int(n_gen)
        out = buf[:n].tolist()
        seq = list(map(int, np.asarray(prompt[0]))) + out
        rounds = int(rounds)
        return {
            "sequences": np.asarray([seq]),
            "tokens": buf[:n],
            "log_probs": lpb[:n],
            "rounds": rounds,
            "acceptance_rate": float(accepted) / max(1, rounds * self.gamma),
        }
