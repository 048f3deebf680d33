"""Batch uncertainty serving: ``compute_uncertainties`` semantics over the
continuous batching engine.

The reference scores ONE prompt per call through a blocking HF ``generate``
(reference llm_uncertainty/scores.py:347-524). This module serves the same
uncertainty surface for a BATCH of prompts through
:class:`~runia_core_tpu.llm.continuous.ContinuousBatchingEngine`:

  - interactive mode runs ONE merged drain: each prompt's deterministic
    request (``sample=False`` — greedy via the engine's per-request
    decoding modes, RAUQ's attention signal gathered in-loop) and its
    ``num_samples`` sampled duplicates are submitted together, sharing one
    admission wave, one prefix-cached prefill (chunk-aligned KV row
    copies), and one drain tail;
  - scores are computed with the SAME ``llm.scores`` functions the
    single-prompt path dispatches to, so semantics are identical.

``eigen_score`` is served through the engine's in-loop hidden-state
signal (``collect_hidden``: each sample's final-token layer hidden vector,
reference llm_uncertainty/utils.py:102-117) in interactive mode; fused
mode and RAUQ aggregations other than original/original (full attention
history) stay on ``compute_uncertainties``.

``fused=True`` drains both passes as single on-device programs
(``generate_all_fused``) — the offline batch-scoring mode: zero per-chunk
host round trips, at the cost of RAUQ/speculative support and prefix-cache
reuse in the sampled pass.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from runia_core_tpu.llm.continuous import ContinuousBatchingEngine
from runia_core_tpu.llm.scores import (
    eigen_score_from_embeddings,
    normalized_entropy,
    perplexity,
    semantic_entropy,
)

__all__ = ["UncertaintyServer", "serve_uncertainties"]

_SEQUENCE_METHODS = {
    "perplexity": False,
    "generation_entropy": False,
    "RAUQ": False,
    "normalized_entropy": True,
    "semantic_entropy": True,
    "eigen_score": True,
}


def _validate(
    requests: Sequence[dict], num_layers: Optional[int] = None
) -> Tuple[bool, bool, bool, Optional[int]]:
    """Fail before ANY decode work (compute_uncertainties' contract).

    ``num_layers`` (when known) normalizes negative eigen_score layer
    indices the same way the engine constructor does (hidden-state entry
    ``li + num_layers + 1``), so requests naming one layer in two notations
    (e.g. ``-1`` and ``num_layers``) are recognized as a single stream."""
    unknown = [
        r["method_name"] for r in requests
        if r["method_name"] not in _SEQUENCE_METHODS
    ]
    if unknown:
        raise KeyError(
            f"unknown uncertainty method(s) {unknown}; valid: "
            f"{sorted(_SEQUENCE_METHODS)}"
        )

    def norm_layer(li: int) -> int:
        if li < 0 and num_layers is not None:
            li += int(num_layers) + 1
        return li

    eigen_layers = {
        norm_layer(int(r.get("layer_index", 15))) for r in requests
        if r["method_name"] == "eigen_score"
    }
    if len(eigen_layers) > 1:
        raise NotImplementedError(
            "engine-served eigen_score streams ONE hidden layer per run; "
            f"got layer_index values {sorted(eigen_layers)} — use "
            "compute_uncertainties for multi-layer scoring"
        )
    rauq_alphas = set()
    for r in requests:
        if r["method_name"] == "RAUQ":
            # The SAME defaults as compute_uncertainties' dispatch
            # (mean_all_tokens/rollout) — a bare RAUQ request must raise
            # here, not silently compute a different aggregation under a
            # different key.
            tok = r.get("token_aggregation", "mean_all_tokens")
            head = r.get("head_aggregation", "rollout")
            if (tok, head) != ("original", "original"):
                raise NotImplementedError(
                    "engine-served RAUQ supports token_aggregation="
                    "'original', head_aggregation='original' (the in-loop "
                    f"signal); got ({tok!r}, {head!r}) — pass them "
                    "explicitly, or use compute_uncertainties for other "
                    "aggregations"
                )
            if len(r.get("alphas", [0.3])) != 1 or r.get("ablation"):
                raise NotImplementedError(
                    "engine-served RAUQ scores one alpha per run; use "
                    "compute_uncertainties for alpha ablations"
                )
            rauq_alphas.add(float(r.get("alphas", [0.3])[0]))
    if len(rauq_alphas) > 1:
        raise NotImplementedError(
            f"engine-served RAUQ uses one in-loop alpha; got {sorted(rauq_alphas)}"
        )
    needs_sampling = any(
        _SEQUENCE_METHODS[r["method_name"]] for r in requests
    )
    needs_rauq = any(r["method_name"] == "RAUQ" for r in requests)
    needs_semantic = any(
        r["method_name"] == "semantic_entropy" for r in requests
    )
    eigen_layer = eigen_layers.pop() if eigen_layers else None
    return needs_sampling, needs_rauq, needs_semantic, eigen_layer


# Engine defaults shared by _make_engine and the fused-mode prechecks (one
# source of truth so validation cannot drift from the engine actually built).
_ENGINE_DEFAULTS = dict(
    num_slots=8,
    chunk_tokens=16,
    prefill_chunk=64,
)


def _make_engine(model, params, max_prompt_len, max_new_tokens, eos_id,
                 collect_rauq, engine_kwargs, **mode):
    kw = dict(_ENGINE_DEFAULTS)
    kw.update(engine_kwargs or {})
    # prefix caching requires chunked prefill; default it accordingly so
    # engine_kwargs={"prefill_chunk": None} selects the bucketed path
    # without also having to know to disable the cache.
    kw.setdefault("prefix_cache", bool(kw["prefill_chunk"]))
    # Budget-bound serving (no EOS, no draft) has a deterministic emission
    # schedule: run those engines open-loop (no mid-drain harvest fetches —
    # see ContinuousBatchingEngine.defer_fetch). Batch scoring consumes
    # whole results anyway, so the burst-streaming trade costs nothing.
    kw.setdefault(
        "defer_fetch",
        eos_id is None and kw.get("draft_model") is None,
    )
    slack = kw.get("gamma", 4) + 1 if kw.get("draft_model") is not None else 0
    if "max_ctx" not in kw:
        max_p = int(max_prompt_len)
        if kw["prefill_chunk"]:
            c = kw["prefill_chunk"]
            kw["max_ctx"] = -(-(max_p + max_new_tokens + slack) // c) * c
        else:
            # the bucketed path validates against the PADDED prompt length
            bucket = kw.get("prompt_bucket", 16)
            p_pad = -(-max(max_p, 1) // bucket) * bucket
            kw["max_ctx"] = p_pad + max_new_tokens + slack
    return ContinuousBatchingEngine(
        model, params, max_new_tokens=max_new_tokens, eos_id=eos_id,
        collect_rauq=collect_rauq, **kw, **mode,
    )


class UncertaintyServer:
    """Persistent batch uncertainty server: build the engines ONCE, serve
    any number of prompt batches.

    ``serve_uncertainties`` constructs fresh engines per call, which means
    re-jitting every engine program (prefill + decode chunk) — 30-60 s per
    shape over a tunneled TPU, fine for one offline batch, fatal for a
    serving loop. This class owns a deterministic engine (greedy, RAUQ
    in-loop if requested) and, when any requested method needs samples, a
    sampled engine; both keep their compiled programs and KV caches across
    :meth:`serve` calls, so steady-state batches run at engine speed.

    The sampled engine's RNG key threads through its chunk programs, so
    repeated batches draw fresh samples. The prefix cache (when on) also
    persists: a prompt resubmitted in a later batch reuses its resident
    prefill rows — cross-batch reuse is exactly what a prefix cache is for.

    Capacity is fixed at construction: ``max_prompt_len`` (or an explicit
    ``engine_kwargs["max_ctx"]``) sizes the KV caches; an over-long prompt
    in a later batch fails fast at submit-time validation.

    Compile-once caveat for ``fused=True``: the fused drain jits one
    program per WORKLOAD SHAPE — (request count, padded prompt chunks,
    max budget) — and the sampled pass multiplies the request count by
    ``num_samples``. Batches of steady size reuse one cached program;
    varying batch sizes each pay a fresh 30-60 s tunneled compile. The
    interactive mode (``fused=False``) is shape-stable by construction —
    its chunk programs depend only on engine capacity — so prefer it when
    batch sizes vary.
    """

    def __init__(
        self,
        model,
        params,
        tokenizer,
        uncertainty_requests: Sequence[dict],
        num_samples: int = 10,
        max_new_tokens: int = 64,
        eos_id: Optional[int] = None,
        temperature: float = 1.0,
        entailment_model=None,
        entailment_tokenizer=None,
        engine_kwargs: Optional[dict] = None,
        fused: bool = False,
        max_prompt_len: Optional[int] = None,
    ):
        needs_sampling, needs_rauq, needs_semantic, eigen_layer = _validate(
            uncertainty_requests, num_layers=getattr(model, "num_layers", None)
        )
        if needs_semantic and entailment_model is None:
            raise ValueError(
                "semantic_entropy needs entailment_model "
                "(no implicit downloads)"
            )
        if fused and needs_rauq:
            raise ValueError(
                "fused=True cannot serve RAUQ (in-loop attention is an "
                "interactive-drain feature); drop the RAUQ request or "
                "fused=True"
            )
        if fused and eigen_layer is not None:
            raise ValueError(
                "fused=True cannot serve eigen_score (in-loop hidden-state "
                "collection is an interactive-drain feature); drop the "
                "eigen_score request or fused=True"
            )
        if fused and (engine_kwargs or {}).get("draft_model") is not None:
            raise ValueError("fused=True supports the plain decode path only")
        if fused and not (engine_kwargs or {}).get(
            "prefill_chunk", _ENGINE_DEFAULTS["prefill_chunk"]
        ):
            raise ValueError("fused=True requires chunked prefill")
        if max_prompt_len is None and "max_ctx" not in (engine_kwargs or {}):
            raise ValueError(
                "UncertaintyServer sizes its KV caches up front: pass "
                "max_prompt_len or engine_kwargs['max_ctx']"
            )

        self.tokenizer = tokenizer
        self.requests = list(uncertainty_requests)
        self.num_samples = int(num_samples)
        self.entailment_model = entailment_model
        self.entailment_tokenizer = entailment_tokenizer
        self.fused = bool(fused)
        self._needs_rauq = needs_rauq

        # the RAUQ dispatcher's default alpha (compute_uncertainties
        # parity; _validate guarantees all RAUQ requests agree on one)
        rauq_alpha = next(
            (float(r.get("alphas", [0.3])[0]) for r in uncertainty_requests
             if r["method_name"] == "RAUQ"), 0.2,
        )
        # Interactive mode with sampling merges BOTH passes into ONE
        # engine drain: the deterministic scoring pass is just a
        # sample=False request riding the sampled engine's chunk programs
        # (per-request decoding modes), so a prompt's det pass and its N
        # samples share one admission wave, one prefix-cached prefill, and
        # one drain tail — and only one engine's programs ever compile.
        # Fused mode and speculative engines keep the two-engine layout.
        self._merged = (
            not fused and needs_sampling
            and (engine_kwargs or {}).get("draft_model") is None
        )
        self.samp_engine = None
        if self._merged:
            mode: Dict[str, Any] = dict(do_sample=True,
                                        temperature=temperature,
                                        rauq_alpha=rauq_alpha)
            if eigen_layer is not None:
                mode["collect_hidden"] = eigen_layer
            self.det_engine = _make_engine(
                model, params, max_prompt_len or 0, max_new_tokens, eos_id,
                needs_rauq, engine_kwargs, **mode,
            )
        else:
            self.det_engine = _make_engine(
                model, params, max_prompt_len or 0, max_new_tokens, eos_id,
                needs_rauq, engine_kwargs, rauq_alpha=rauq_alpha,
            )
            if needs_sampling:
                mode = dict(do_sample=True, temperature=temperature)
                if eigen_layer is not None:
                    mode["collect_hidden"] = eigen_layer
                self.samp_engine = _make_engine(
                    model, params, max_prompt_len or 0, max_new_tokens,
                    eos_id, False, engine_kwargs, **mode,
                )

    def serve(
        self, prompts: Sequence[Sequence[int]]
    ) -> Tuple[List[Any], List[Dict[str, Any]]]:
        """Run one batch: deterministic pass, sampled pass (if any method
        needs it), then score. Returns ``(texts, scores)`` exactly like
        :func:`serve_uncertainties`."""
        if self._merged:
            # One drain serves the deterministic pass AND the samples:
            # submissions interleave per prompt so a prompt's duplicates
            # sit adjacent (the first admission prefills, the rest hit the
            # prefix cache).
            eng = self.det_engine
            det_ids = []
            samp_ids: List[List[int]] = []
            for p in prompts:
                det_ids.append(eng.submit(p, sample=False))
                samp_ids.append([
                    eng.submit(p, sample=True)
                    for _ in range(self.num_samples)
                ])
            eng.run_until_drained()
            det = [eng.result(r) for r in det_ids]
            samp = [[eng.result(r) for r in rs] for rs in samp_ids]
            eng.clear_results()
            return self._score(prompts, det, samp)

        det = (self.det_engine.generate_all_fused(prompts) if self.fused
               else self.det_engine.generate_all(prompts))
        self.det_engine.clear_results()

        samp: List[List[dict]] = [[] for _ in prompts]
        if self.samp_engine is not None:
            if self.fused:
                flat = [p for p in prompts for _ in range(self.num_samples)]
                res = self.samp_engine.generate_all_fused(flat)
                for i in range(len(prompts)):
                    samp[i] = res[
                        i * self.num_samples: (i + 1) * self.num_samples
                    ]
                # generate_all_fused never touches _results today, but keep
                # every pass on the same clear lifecycle (cheap no-op).
                self.samp_engine.clear_results()
            else:
                # Interleave submissions so each prompt's duplicates land
                # near each other: the first admission prefills, the rest
                # hit the prefix cache (chunk-aligned full-prompt reuse).
                ids = [
                    (i, self.samp_engine.submit(p))
                    for i, p in enumerate(prompts)
                    for _ in range(self.num_samples)
                ]
                self.samp_engine.run_until_drained()
                for i, rid in ids:
                    samp[i].append(self.samp_engine.result(rid))
                self.samp_engine.clear_results()

        return self._score(prompts, det, samp)

    def _score(
        self, prompts, det: List[dict], samp: List[List[dict]]
    ) -> Tuple[List[Any], List[Dict[str, Any]]]:
        """Turn one batch's engine results into (texts, score dicts) —
        shared by the merged, two-engine, and fused drains."""
        decode = (
            (lambda t: self.tokenizer.decode(t))
            if self.tokenizer is not None else (lambda t: list(t))
        )
        det_texts = [decode(r["tokens"]) for r in det]

        scores: List[Dict[str, Any]] = []
        for i, det_res in enumerate(det):
            out: Dict[str, Any] = {}
            for req in self.requests:
                name = req["method_name"]
                if name == "perplexity":
                    out[name] = perplexity(det_res["log_probs"])
                elif name == "generation_entropy":
                    # computed in the decode loop; parity with
                    # scores.generation_entropy is test-pinned
                    out[name] = det_res["generation_entropy"]
                elif name == "RAUQ":
                    out["RAUQ_original_original"] = det_res["rauq"]
                elif name == "normalized_entropy":
                    lens = [len(r["log_probs"]) for r in samp[i]]
                    width = max(max(lens), 1)
                    lp = np.full(
                        (len(samp[i]), width), -np.inf, np.float32
                    )
                    for j, r in enumerate(samp[i]):
                        lp[j, : lens[j]] = r["log_probs"]
                    out[name] = normalized_entropy(lp)
                elif name == "eigen_score":
                    embs = [
                        r["hidden"] for r in samp[i]
                        if r.get("hidden") is not None
                    ]
                    out[name] = (
                        eigen_score_from_embeddings(np.stack(embs))
                        if len(embs) >= 2 else float("nan")
                    )
                elif name == "semantic_entropy":
                    texts = [decode(r["tokens"]) for r in samp[i]]
                    ent, clusters = semantic_entropy(
                        self.entailment_model, self.entailment_tokenizer,
                        texts,
                    )
                    out[name] = ent
                    out["clusters"] = {
                        (tuple(t) if isinstance(t, list) else t): c
                        for c, idxs in clusters.items()
                        for j in idxs
                        for t in [texts[j]]
                    }
            scores.append(out)
        return det_texts, scores

    def stats(self) -> dict:
        """Cumulative engine counters (see
        :meth:`ContinuousBatchingEngine.stats`): ``{"deterministic": ...}``
        — the merged engine when both passes share one drain —
        plus ``"sampled"`` when a separate sampled engine exists."""
        out = {"deterministic": self.det_engine.stats()}
        if self.samp_engine is not None:
            out["sampled"] = self.samp_engine.stats()
        return out


def serve_uncertainties(
    model,
    params,
    tokenizer,
    prompts: Sequence[Sequence[int]],
    uncertainty_requests: Sequence[dict],
    num_samples: int = 10,
    max_new_tokens: int = 64,
    eos_id: Optional[int] = None,
    temperature: float = 1.0,
    entailment_model=None,
    entailment_tokenizer=None,
    engine_kwargs: Optional[dict] = None,
    fused: bool = False,
) -> Tuple[List[Any], List[Dict[str, Any]]]:
    """Score a BATCH of prompts with ``compute_uncertainties`` semantics.

    One-shot convenience over :class:`UncertaintyServer` — builds the
    engines, serves this batch, and throws them away. A serving loop that
    scores batch after batch should hold an ``UncertaintyServer`` instead:
    engine programs jit once per instance, and rebuilding them per batch
    costs 30-60 s per shape over a tunneled TPU.

    Args:
        model/params: a ``LlamaLM``-style model (the engine contract).
        tokenizer: ``decode(List[int]) -> str`` or None (token-id lists are
            then used as the "texts" — the pluggable-entailment test path).
        prompts: token-id sequences.
        uncertainty_requests: ``[{"method_name": ...}, ...]`` — perplexity,
            generation_entropy, RAUQ (original/original), normalized_entropy,
            semantic_entropy.
        engine_kwargs: forwarded to both engines (slots, chunking, draft
            model for speculative serving, ...).
        fused: drain each pass with
            :meth:`ContinuousBatchingEngine.generate_all_fused` — the
            on-device scheduler, zero per-chunk host round trips. Which
            drain is faster is workload-dependent: fused wins when host
            round trips dominate (small models, many tiny chunks over a
            high-latency tunnel); at production size the lookahead-
            pipelined interactive drain already hides the round trips and
            measures FASTER (BENCH r4: 1735 vs 2273 tok/s on the 96-request
            1.17B leg) — profile both on your workload. Trade-offs: RAUQ
            is interactive-only (in-loop attention collection — requesting
            it here raises), a draft model is rejected, and the sampled
            pass re-prefills each duplicate instead of hitting the prefix
            cache.

    Returns:
        (deterministic_texts, scores): one decoded text and one score dict
        per prompt, score keys matching ``compute_uncertainties``.
    """
    server = UncertaintyServer(
        model, params, tokenizer, uncertainty_requests,
        num_samples=num_samples, max_new_tokens=max_new_tokens,
        eos_id=eos_id, temperature=temperature,
        entailment_model=entailment_model,
        entailment_tokenizer=entailment_tokenizer,
        engine_kwargs=engine_kwargs, fused=fused,
        max_prompt_len=max(len(p) for p in prompts),
    )
    return server.serve(prompts)
