"""LLM hallucination / uncertainty scores.

numpy/JAX equivalents of reference runia_core/llm_uncertainty/scores.py:
eigen score, normalized entropy, semantic entropy, perplexity, generation
entropy, and the three RAUQ head aggregations — operating on HF-shaped
outputs (tuples of arrays) so both torch-HF models and the JAX decode loop
(llm/generate.py) can feed them. ``compute_uncertainties`` keeps the
reference's one-call orchestration and registry.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
from scipy.special import softmax

from runia_core_tpu.llm.attention import (
    _get_attention_rollout,
    _get_average_attention_all,
    _get_recurent_attention,
)
from runia_core_tpu.llm.utils import (
    _construct_embedding_matrix,
    _get_probability_distribution,
    _semantic_clustering,
    _semantic_clustering_batched,
)

__all__ = [
    "eigen_score",
    "normalized_entropy",
    "semantic_entropy",
    "perplexity",
    "generation_entropy",
    "rauq_uncertainty",
    "rauq_uncertainty_mean_heads",
    "rauq_uncertainty_rollout",
    "RAUQ",
    "batched_rauq",
    "compute_uncertainties",
    "eigen_score_from_embeddings",
]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu()
    return np.asarray(x)


def eigen_score(hidden_states, alpha: float = 1e-3, layer_index: int = 15) -> float:
    """Mean log singular value of the sample-embedding covariance
    (reference scores.py:49-66; Chen et al. 2024).

    ``hidden_states`` is HF-shaped: tuple over generated tokens of tuples
    over layers; the embedding matrix uses token -1, layer 15 defaults.
    ``layer_index`` is exposed (negative indices allowed) because the
    reference's hardcoded layer 15 crashes on models shallower than 15
    layers; 15 stays the default for reference parity.
    """
    return eigen_score_from_embeddings(
        _construct_embedding_matrix(hidden_states, layer_index=layer_index),
        alpha=alpha,
    )


def eigen_score_from_embeddings(embeddings, alpha: float = 1e-3) -> float:
    """EigenScore from an already-built (num_samples, d) embedding matrix —
    the covariance log-determinant core of :func:`eigen_score`, split out so
    the serving engine (which streams each sample's final-token hidden
    vector directly, see ``ContinuousBatchingEngine(collect_hidden=...)``)
    can score without reconstructing the HF hidden_states protocol.

    With n samples the (d, d) covariance has rank <= n-1, so its spectrum
    is {lambda_1..lambda_{n-1}} from the (n, n) Gram of the centered rows
    padded with zeros — the dense formula's d^3 SVD (several seconds per
    call at d=2048 on one host core, measured as the uncertainty-serving
    leg's dominant cost) collapses to an O(n^2 d) Gram + an n-eigh.
    Numerics match the reference SVD-of-covariance form (same eigenvalues
    up to float noise; parity test-pinned)."""
    embedding_matrix = _np(embeddings).astype(float)
    n, d = embedding_matrix.shape if embedding_matrix.ndim == 2 else (0, 0)
    if embedding_matrix.ndim == 2 and 1 < n < d:
        centered = embedding_matrix - embedding_matrix.mean(axis=0)
        gram = centered @ centered.T / (n - 1)
        lam = np.clip(np.linalg.eigvalsh(gram), 0.0, None)
        total = np.sum(np.log(lam + alpha)) + (d - n) * np.log(alpha)
        return float(total / d)
    cov_matrix = np.cov(embedding_matrix.T)
    _, singular_values, _ = np.linalg.svd(
        cov_matrix + alpha * np.eye(cov_matrix.shape[0])
    )
    return float(np.mean(np.log(singular_values)))


def normalized_entropy(log_probs) -> float:
    """Length-normalized negative log-likelihood averaged over sequences
    (reference scores.py:69-85; Malinin & Gales 2021). -inf entries mark
    padding after EOS and are excluded."""
    log_probs = _np(log_probs)
    n = len(log_probs)
    entropy = 0.0
    for seq in log_probs:
        valid = seq != -np.inf
        entropy += np.sum(seq[valid]) / np.sum(valid)
    return float(-entropy / n)


def semantic_entropy(
    model, tokenizer, texts: List[str]
) -> Tuple[float, Dict[int, List[int]]]:
    """Discrete semantic entropy over NLI-equivalence clusters
    (reference scores.py:88-118; Kuhn et al. 2023). ``model`` may be an HF
    NLI model (with ``tokenizer``) or an equivalence callable
    (tokenizer=None).

    With an HF model the O(n^2) NLI pairs ride ONE padded batched forward
    (``_semantic_clustering_batched``) instead of the reference's sequential
    per-pair calls; the pairwise callable path stays sequential and is the
    parity oracle. A callable carrying ``is_batch_labels=True`` (e.g.
    ``models.deberta.wrap_jax_nli`` — the TPU-native entailment path) is
    treated as a batched ``(premises, hypotheses) -> labels`` function and
    rides the batched clustering too."""
    if tokenizer is not None or getattr(model, "is_batch_labels", False):
        clusters = _semantic_clustering_batched(model, tokenizer, texts)
    else:
        clusters = _semantic_clustering(model, tokenizer, texts)
    total = sum(len(indices) for indices in clusters.values())
    entropy = 0.0
    for indices in clusters.values():
        p = len(indices) / total
        if p > 0:
            entropy -= p * np.log(p)
    return float(entropy), clusters


def perplexity(log_probs) -> float:
    """Mean negative log-probability of the generated tokens
    (reference scores.py:121-132). Post-EOS padding entries (-inf, emitted
    by JaxGenerator) are excluded — the HF backend stops at EOS, so
    including them would return inf where it returns a finite value."""
    lp = _np(log_probs)
    lp = lp[np.isfinite(lp)]
    return float(-np.mean(lp))


def generation_entropy(logits) -> float:
    """Vocab-normalized entropy averaged over generated tokens
    (reference scores.py:135-152)."""
    prob_dist = _get_probability_distribution(logits)
    entropies = []
    for p in prob_dist:
        log_p = np.log(np.clip(p, 1e-12, None))
        entropies.append(float(-(p * log_p).sum() / np.log(p.shape[-1])))
    return float(np.mean(entropies))


_TOKEN_AGGREGATORS = {
    "original": _get_recurent_attention,
    "mean_all_tokens": _get_average_attention_all,
}


def _rauq_recurrence(
    probs: np.ndarray, att_per_step: np.ndarray, alpha: float
) -> np.ndarray:
    """Shared RAUQ confidence recurrence c_i = a*p_i + (1-a)*att_i*c_{i-1}.

    Args:
        probs: (T,) token probabilities.
        att_per_step: (N, ...) per-step attention values (first row unused).

    Returns:
        (N, ...) confidences with c_0 = p_0 broadcast.
    """
    n = att_per_step.shape[0]
    shape = (n,) + att_per_step.shape[1:]
    confidence = np.zeros(shape)
    confidence[0] = probs[0] if probs.ndim > 0 else float(probs)
    for i in range(1, n):
        confidence[i] = alpha * probs[i] + (1 - alpha) * att_per_step[i] * confidence[i - 1]
    return confidence


def rauq_uncertainty(
    log_probs,
    attentions,
    token_aggregation: str,
    alphas: List[float] = [0.2],
    ablation: bool = False,
    attention_weights: Optional[np.ndarray] = None,
) -> Union[float, List[float]]:
    """Original RAUQ: per-layer most-attentive head, token recurrence,
    max over layers of mean -log confidence (reference scores.py:155-219;
    Vazhentsev et al. 2025).

    ``attention_weights`` may be supplied directly (e.g. from the streaming
    aggregator) to skip the HF-tuple aggregation.
    """
    if attention_weights is None:
        attention_weights = _TOKEN_AGGREGATORS[token_aggregation](attentions)
    attention_weights = _np(attention_weights)
    num_layers, _, n = attention_weights.shape

    head_l = [
        int(np.argmax(attention_weights[layer, :, 1:].mean(axis=1)))
        for layer in range(num_layers)
    ]
    probs = np.exp(np.squeeze(_np(log_probs)))

    uncertainty_alpha = []
    for alpha in alphas:
        att_per_step = np.stack(
            [attention_weights[np.arange(num_layers), head_l, i] for i in range(n)]
        )  # (N, L)
        confidence = _rauq_recurrence(probs, att_per_step, alpha)
        uncertainty_l = -np.mean(np.log(confidence), axis=0)
        uncertainty_alpha.append(float(uncertainty_l.max()))
    return uncertainty_alpha[0] if not ablation else uncertainty_alpha


def rauq_uncertainty_mean_heads(
    log_probs,
    attentions,
    token_aggregation: str,
    alphas: List[float] = [0.3],
    ablation: bool = False,
    attention_weights: Optional[np.ndarray] = None,
) -> Union[float, List[float]]:
    """RAUQ with head-averaged attention (reference scores.py:222-273)."""
    if attention_weights is None:
        attention_weights = _TOKEN_AGGREGATORS[token_aggregation](attentions)
    attention_weights = _np(attention_weights).mean(axis=1)  # (L, N)
    num_layers, n = attention_weights.shape
    probs = np.exp(np.squeeze(_np(log_probs)))

    uncertainty_alpha = []
    for alpha in alphas:
        att_per_step = attention_weights.T  # (N, L)
        confidence = _rauq_recurrence(probs, att_per_step, alpha)
        uncertainty_l = -np.mean(np.log(confidence), axis=0)
        uncertainty_alpha.append(float(uncertainty_l.max()))
    return uncertainty_alpha[0] if not ablation else uncertainty_alpha


def rauq_uncertainty_rollout(
    log_probs,
    attentions,
    token_aggregation: str,
    input_length: int,
    alphas: List[float] = [0.4],
    ablation: bool = False,
    attention_rollout: Optional[np.ndarray] = None,
) -> Union[float, List[float]]:
    """RAUQ over the attention-rollout matrix (reference scores.py:276-322).

    ``attention_rollout`` may be supplied directly (streaming aggregator) to
    skip the dense reconstruction.
    """
    log_probs = _np(log_probs)
    if attention_rollout is None:
        attention_rollout = _get_attention_rollout(attentions, input_length)
    t = log_probs.shape[1]
    if token_aggregation == "original":
        attention_weights = np.diagonal(attention_rollout, offset=-1)[-t:]
    elif token_aggregation == "mean_all_tokens":
        attention_weights = attention_rollout[:, -t:].mean(axis=0)
    probs = np.exp(np.squeeze(log_probs))
    n = probs.shape[0]

    uncertainty_alpha = []
    for alpha in alphas:
        confidence = _rauq_recurrence(probs, attention_weights, alpha)[:n]
        uncertainty_alpha.append(float(-np.mean(np.log(confidence))))
    return uncertainty_alpha if ablation else uncertainty_alpha[0]


def RAUQ(
    log_probs, attentions, input_length, token_aggregation, head_aggregation, alphas, ablation
):
    """Dispatch over the three head aggregations (reference scores.py:325-344)."""
    if head_aggregation == "original":
        return rauq_uncertainty(log_probs, attentions, token_aggregation, alphas, ablation)
    if head_aggregation == "mean_heads":
        return rauq_uncertainty_mean_heads(
            log_probs, attentions, token_aggregation, alphas, ablation
        )
    if head_aggregation == "rollout":
        return rauq_uncertainty_rollout(
            log_probs, attentions, token_aggregation, input_length, alphas, ablation
        )
    raise KeyError(head_aggregation)


def batched_rauq(
    log_probs: np.ndarray,
    prev_token_attention: np.ndarray,
    head_aggregation: str = "original",
    alphas: List[float] = [0.2],
    ablation: bool = False,
) -> Union[np.ndarray, List]:
    """RAUQ over a multi-prompt batch from ``JaxGenerator.generate_batch``.

    Args:
        log_probs: (B, T) transition log-probs from the batched decode.
        prev_token_attention: (B, L, H, T-1) previous-token attention from
            ``generate_batch(..., output_attentions=True)`` — the "original"
            token aggregation's statistic, extracted on device.
        head_aggregation: "original" (per-layer most-attentive head) or
            "mean_heads"; "rollout" needs the dense attention matrix and is
            served by the single-prompt path.

    Returns:
        (B,) uncertainties, or a length-B list of per-alpha lists when
        ``ablation`` is set.
    """
    fns = {
        "original": rauq_uncertainty,
        "mean_heads": rauq_uncertainty_mean_heads,
    }
    if head_aggregation not in fns:
        raise KeyError(
            f"{head_aggregation!r}: batched RAUQ supports {sorted(fns)}"
        )
    fn = fns[head_aggregation]
    log_probs = _np(log_probs)
    out = [
        fn(
            log_probs[b],
            None,
            "original",
            alphas,
            ablation,
            attention_weights=prev_token_attention[b],
        )
        for b in range(log_probs.shape[0])
    ]
    return out if ablation else np.asarray(out)


def compute_uncertainties(
    model,
    tokenizer,
    prompt: str,
    uncertainty_requests: List[Dict[str, Any]],
    gen_config=None,
    num_samples: int = 5,
    entailment_model=None,
    entailment_tokenizer=None,
) -> Tuple[str, Dict[str, Any]]:
    """Generate text and compute the requested uncertainty scores
    (reference scores.py:347-524).

    ``model`` is either an HF causal LM (duck-typed on ``.generate``) or a
    :class:`runia_core_tpu.llm.generate.JaxGenerator`. For semantic entropy,
    pass an entailment model explicitly (``entailment_model`` either an HF
    NLI model + tokenizer or an equivalence callable); unlike the reference,
    no network download is attempted implicitly — if omitted, the reference's
    deberta-v2-xxlarge-mnli lazy load is tried.
    """
    registry = {
        "eigen_score": {
            "fn": lambda det, samp, req: eigen_score(
                samp["hidden_states"],
                layer_index=req.get("layer_index", 15),
            ),
            "needs_sampling": True,
        },
        "normalized_entropy": {
            "fn": lambda det, samp, req: normalized_entropy(samp["log_probs"]),
            "needs_sampling": True,
        },
        "semantic_entropy": {
            "fn": lambda det, samp, req: semantic_entropy(
                samp["model_entailment"], samp["tokenizer_entailment"], samp["texts"]
            ),
            "needs_sampling": True,
        },
        "perplexity": {
            "fn": lambda det, samp, req: perplexity(det["log_probs"]),
            "needs_sampling": False,
        },
        "generation_entropy": {
            "fn": lambda det, samp, req: generation_entropy(det["logits"]),
            "needs_sampling": False,
        },
        "RAUQ": {
            "fn": lambda det, samp, req: RAUQ(
                det["log_probs"],
                det["attentions"],
                input_length=det["input_length"],
                token_aggregation=req.get("token_aggregation", "mean_all_tokens"),
                head_aggregation=req.get("head_aggregation", "rollout"),
                alphas=req.get("alphas", [0.3]),
                ablation=req.get("ablation", False),
            ),
            "needs_sampling": False,
        },
    }

    # ---- request validation: fail before ANY decode work --------------------
    from runia_core_tpu.llm.generate import run_generation, validate_generation_request

    unknown = [
        req["method_name"] for req in uncertainty_requests
        if req["method_name"] not in registry
    ]
    if unknown:
        raise KeyError(
            f"unknown uncertainty method(s) {unknown}; valid: {sorted(registry)}"
        )
    method_names = {req["method_name"] for req in uncertainty_requests}
    needs_sampling = any(
        registry[req["method_name"]]["needs_sampling"] for req in uncertainty_requests
    )
    validate_generation_request(
        model, needs_sampling, needs_hiddens="eigen_score" in method_names
    )

    need_semantic_clustering = any(
        req["method_name"] == "semantic_entropy" for req in uncertainty_requests
    )
    if need_semantic_clustering and entailment_model is None:  # pragma: no cover
        from transformers import AutoModelForSequenceClassification, AutoTokenizer

        entailment_model = AutoModelForSequenceClassification.from_pretrained(
            "microsoft/deberta-v2-xxlarge-mnli", device_map="auto"
        )
        entailment_tokenizer = AutoTokenizer.from_pretrained(
            "microsoft/deberta-v2-xxlarge-mnli"
        )

    # ---- deterministic + sampled generation via the backend -----------------
    deterministic, sampled_raw, deterministic_text = run_generation(
        model, tokenizer, prompt, gen_config, num_samples,
        needs_sampling=needs_sampling,
        needs_attentions="RAUQ" in method_names,
        needs_hiddens="eigen_score" in method_names,
    )
    sampled = dict(sampled_raw)
    sampled["model_entailment"] = entailment_model if need_semantic_clustering else None
    sampled["tokenizer_entailment"] = (
        entailment_tokenizer if need_semantic_clustering else None
    )

    # ---- score dispatch ------------------------------------------------------
    scores: Dict[str, Any] = {}
    for req in uncertainty_requests:
        # Use the same defaults as the RAUQ dispatch fn below, so a bare
        # {"method_name": "RAUQ"} request names its score consistently
        # instead of raising KeyError.
        name = req["method_name"]
        if name == "RAUQ":
            name += (
                "_" + str(req.get("token_aggregation", "mean_all_tokens"))
                + "_" + str(req.get("head_aggregation", "rollout"))
            )
        fn_entry = registry[req["method_name"]]
        scores[name] = fn_entry["fn"](deterministic, sampled, req)
        if req["method_name"] == "semantic_entropy":
            # Without a tokenizer the "texts" are token-id lists — tuple-ize
            # so they stay usable as dict keys.
            scores["clusters"] = {
                (tuple(t) if isinstance(t, list) else t): cluster
                for cluster, texts in scores[name][1].items()
                for i in texts
                for t in [sampled["texts"][i]]
            }
            scores[name] = scores[name][0]
    return deterministic_text, scores
