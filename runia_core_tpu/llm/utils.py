"""LLM uncertainty helpers: NLI equivalence, clustering, distributions.

numpy/JAX equivalents of reference runia_core/llm_uncertainty/utils.py.
The entailment model is pluggable: pass either an HF
(model, tokenizer) pair or any callable ``(text1, text2) -> bool``.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple, Union

import numpy as np
from scipy.special import softmax

__all__ = [
    "_are_equivalent",
    "_semantic_clustering",
    "_semantic_clustering_batched",
    "_pairwise_equivalence_matrix",
    "_get_probability_distribution",
    "_construct_embedding_matrix",
    "make_nli_equivalence",
    "make_nli_batch_labels",
]

# MNLI-style label ids (deberta-mnli ordering, reference utils.py:11-43).
_CONTRADICTION, _NEUTRAL = 0, 1


def _nli_predict(model, tokenizer, premise: str, hypothesis: str) -> int:
    """argmax NLI label of an HF sequence-classification model (host-side)."""
    inputs = tokenizer(premise, hypothesis, return_tensors="pt")
    if hasattr(model, "device"):
        inputs = {k: v.to(model.device) for k, v in inputs.items()}
    outputs = model(**inputs)
    logits = np.asarray(outputs.logits.detach().cpu())
    return int(np.argmax(softmax(logits, axis=1), axis=1)[0])


def _labels_equivalent(fwd: int, bwd: int) -> bool:
    """Bidirectional-label decision rule (behavioral parity with reference
    utils.py:30-43): a contradiction in either direction rules equivalence
    out, and two neutrals carry no evidence; anything else counts."""
    if _CONTRADICTION in (fwd, bwd):
        return False
    return not (fwd == _NEUTRAL and bwd == _NEUTRAL)


def _are_equivalent(model, tokenizer, text1: str, text2: str) -> bool:
    """NLI equivalence of two texts, querying both directions."""
    return _labels_equivalent(
        _nli_predict(model, tokenizer, text1, text2),
        _nli_predict(model, tokenizer, text2, text1),
    )


def make_nli_equivalence(model, tokenizer) -> Callable[[str, str], bool]:
    """Wrap an HF NLI model into an equivalence callable."""
    return lambda a, b: _are_equivalent(model, tokenizer, a, b)


def make_nli_batch_labels(model, tokenizer) -> Callable[..., np.ndarray]:
    """Wrap an HF NLI model into a batched label function: lists of premises
    and hypotheses in, an (n,) int label array out of ONE padded forward.

    This is the TPU-era replacement for the reference's per-pair calls
    (utils.py:11-43): all pairs ride a single batch so the accelerator sees
    one large matmul-heavy forward instead of O(n^2) tiny ones."""

    def batch_labels(premises: Sequence[str], hypotheses: Sequence[str]) -> np.ndarray:
        import torch

        inputs = tokenizer(
            list(premises), list(hypotheses),
            return_tensors="pt", padding=True, truncation=True,
        )
        if hasattr(model, "device"):
            inputs = {k: v.to(model.device) for k, v in inputs.items()}
        with torch.no_grad():
            logits = model(**inputs).logits
        return np.argmax(np.asarray(logits.detach().cpu()), axis=1)

    return batch_labels


def _cluster_greedy(n: int, is_equivalent: Callable[[int, int], bool]) -> Dict[int, List[int]]:
    """First-fit clustering over indices 0..n-1 (behavioral parity with
    reference utils.py:46-80): scanning left to right, each still-unassigned
    index opens a new cluster and absorbs every later unassigned index
    equivalent to it. Only representative-vs-candidate pairs are queried."""
    representative = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        if representative[i] >= 0:
            continue
        representative[i] = i
        for j in range(i + 1, n):
            if representative[j] < 0 and is_equivalent(i, j):
                representative[j] = i

    members: Dict[int, List[int]] = {}
    for idx, rep in enumerate(representative.tolist()):
        members.setdefault(rep, []).append(idx)
    return {ci: idxs for ci, idxs in enumerate(members.values())}


def _semantic_clustering(
    model_or_fn: Union[Callable[[str, str], bool], object],
    tokenizer,
    texts: List[str],
) -> Dict[int, List[int]]:
    """Sequential O(n^2)-query clustering of semantically equivalent texts.
    ``model_or_fn`` may be an equivalence callable (tokenizer=None) or an HF
    model with its tokenizer. Kept as the parity oracle for
    :func:`_semantic_clustering_batched`."""
    if callable(model_or_fn) and tokenizer is None:
        equivalent = model_or_fn
    else:
        equivalent = make_nli_equivalence(model_or_fn, tokenizer)
    return _cluster_greedy(
        len(texts), lambda i, j: bool(equivalent(texts[i], texts[j]))
    )


def _pairwise_equivalence_matrix(
    batch_labels: Callable[..., np.ndarray], texts: Sequence[str]
) -> np.ndarray:
    """(n, n) boolean equivalence matrix from ONE batched NLI call.

    Both directions of every unordered pair are packed into a single batch of
    n*(n-1) (premise, hypothesis) rows; the decision rule is then applied
    vectorized."""
    n = len(texts)
    iu, ju = np.triu_indices(n, k=1)
    premises = [texts[i] for i in iu] + [texts[j] for j in ju]
    hypotheses = [texts[j] for j in ju] + [texts[i] for i in iu]

    mat = np.eye(n, dtype=bool)
    if len(premises):
        labels = np.asarray(batch_labels(premises, hypotheses))
        fwd, bwd = labels[: len(iu)], labels[len(iu):]
        no_contradiction = (fwd != _CONTRADICTION) & (bwd != _CONTRADICTION)
        some_evidence = (fwd != _NEUTRAL) | (bwd != _NEUTRAL)
        eq = no_contradiction & some_evidence
        mat[iu, ju] = eq
        mat[ju, iu] = eq
    return mat


def _semantic_clustering_batched(
    model_or_fn: Union[Callable[..., np.ndarray], object],
    tokenizer,
    texts: List[str],
) -> Dict[int, List[int]]:
    """Clusters identical to :func:`_semantic_clustering` with O(1) model
    calls: precompute the full pairwise matrix in one batched NLI forward,
    then run the same first-fit scan over it. ``model_or_fn`` may be a
    batched label callable ``(premises, hypotheses) -> labels``
    (tokenizer=None) or an HF model with its tokenizer."""
    if callable(model_or_fn) and tokenizer is None:
        batch_labels = model_or_fn
    else:
        batch_labels = make_nli_batch_labels(model_or_fn, tokenizer)
    mat = _pairwise_equivalence_matrix(batch_labels, texts)
    return _cluster_greedy(len(texts), lambda i, j: bool(mat[i, j]))


def _get_probability_distribution(logits) -> np.ndarray:
    """HF ``outputs.scores`` tuple -> (num_generated, vocab) probabilities
    (reference utils.py:83-99)."""
    probs = []
    for logit in logits:
        arr = np.asarray(logit.detach().cpu() if hasattr(logit, "detach") else logit)
        probs.append(softmax(arr[0], axis=-1))
    return np.stack(probs, axis=0)


def _construct_embedding_matrix(
    hidden_states, token_index: int = -1, layer_index: int = 15
) -> np.ndarray:
    """EigenScore embedding matrix: hidden states of the chosen token/layer
    (defaults token -1, layer 15; reference utils.py:102-117)."""
    hs = hidden_states[token_index][layer_index]
    arr = np.asarray(hs.detach().cpu() if hasattr(hs, "detach") else hs)
    return np.squeeze(arr)
