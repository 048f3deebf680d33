"""LLM uncertainty helpers: NLI equivalence, clustering, distributions.

numpy/JAX equivalents of reference runia_core/llm_uncertainty/utils.py.
The entailment model is pluggable: pass either an HF
(model, tokenizer) pair or any callable ``(text1, text2) -> bool``.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple, Union

import numpy as np
from scipy.special import softmax

__all__ = [
    "_are_equivalent",
    "_semantic_clustering",
    "_get_probability_distribution",
    "_construct_embedding_matrix",
    "make_nli_equivalence",
]


def _nli_predict(model, tokenizer, premise: str, hypothesis: str) -> int:
    """argmax NLI label of an HF sequence-classification model (host-side)."""
    inputs = tokenizer(premise, hypothesis, return_tensors="pt")
    if hasattr(model, "device"):
        inputs = {k: v.to(model.device) for k, v in inputs.items()}
    outputs = model(**inputs)
    logits = np.asarray(outputs.logits.detach().cpu())
    return int(np.argmax(softmax(logits, axis=1), axis=1)[0])


def _are_equivalent(model, tokenizer, text1: str, text2: str) -> bool:
    """Bidirectional NLI equivalence (reference utils.py:11-43): equivalent
    iff neither direction is contradiction (label 0) and not both neutral
    (label 1)."""
    result1 = _nli_predict(model, tokenizer, text1, text2)
    result2 = _nli_predict(model, tokenizer, text2, text1)
    implications = (result1, result2)
    return (0 not in implications) and (implications != (1, 1))


def make_nli_equivalence(model, tokenizer) -> Callable[[str, str], bool]:
    """Wrap an HF NLI model into an equivalence callable."""
    return lambda a, b: _are_equivalent(model, tokenizer, a, b)


def _semantic_clustering(
    model_or_fn: Union[Callable[[str, str], bool], object],
    tokenizer,
    texts: List[str],
) -> Dict[int, List[int]]:
    """Greedy O(n^2) clustering of semantically equivalent texts
    (reference utils.py:46-80). ``model_or_fn`` may be an equivalence
    callable (tokenizer=None) or an HF model with its tokenizer."""
    if callable(model_or_fn) and tokenizer is None:
        equivalent = model_or_fn
    else:
        equivalent = make_nli_equivalence(model_or_fn, tokenizer)

    clusters = []
    clustered = set()
    for i in range(len(texts)):
        if i in clustered:
            continue
        current = [i]
        clustered.add(i)
        for j in range(i + 1, len(texts)):
            if j in clustered:
                continue
            if equivalent(texts[i], texts[j]):
                current.append(j)
                clustered.add(j)
        clusters.append(current)
    return {idx: cluster for idx, cluster in enumerate(clusters)}


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
