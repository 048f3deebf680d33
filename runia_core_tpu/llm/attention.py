"""Attention aggregation for LLM uncertainty scores.

Two tiers (SURVEY.md section 5 "Long-context"):

1. HF-compatible functions taking the incremental ``outputs.attentions``
   structure (tuple over generated steps, each a tuple over layers of
   (1, H, tgt, src) arrays) — numpy re-implementations of reference
   runia_core/llm_uncertainty/attention_aggregation.py.

2. :class:`StreamingAttentionAggregator`, which folds the same aggregations
   into a decode loop: prev-token and mean-over-past attention keep one
   (L, H) vector per step, and the rollout product is maintained
   incrementally by exploiting the causal lower-triangular block structure
   (appending a token changes only the new row of every partial product).
   Memory is O(L * N^2) instead of the reference's O(L * H * N^2) dense
   reconstruction (attention_aggregation.py:26-44), and per-step rows can be
   discarded immediately.

Reference quirks preserved bit-for-bit: the reconstruction stores step k's
attention row (source length P+k) at matrix row P+k, so row P (the first
generated token) remains empty and becomes an identity row after the rollout
augmentation; the identity contribution lands at the matrix row index, one
past the row's own attention span.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

__all__ = [
    "_reconstruct_attention_matrix",
    "_get_attention_rollout",
    "_get_recurent_attention",
    "_get_average_attention_all",
    "StreamingAttentionAggregator",
]


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _reconstruct_attention_matrix(attentions, input_length: int) -> np.ndarray:
    """Rebuild the dense (L, H, N, N) attention map from incremental HF
    outputs (reference attention_aggregation.py:5-44)."""
    num_generated = len(attentions)
    num_layers = len(attentions[0])
    first = _to_np(attentions[0][0])
    batch_size, num_heads = first.shape[:2]
    total_seq_len = input_length + num_generated

    full = np.zeros((num_layers, batch_size, num_heads, total_seq_len, total_seq_len))
    for generated_idx, per_layer_attn in enumerate(attentions):
        for layer_idx, attn in enumerate(per_layer_attn):
            attn = _to_np(attn)
            if generated_idx == 0:
                full[layer_idx, :, :, :input_length, :input_length] = attn
            else:
                full[
                    layer_idx, :, :, input_length + generated_idx,
                    : input_length + generated_idx,
                ] = attn.squeeze(2)
    return full.squeeze(1)


def _augment(a: np.ndarray) -> np.ndarray:
    """(mean-head attention + I) row-normalized (Abnar & Zuidema rollout)."""
    n = a.shape[-1]
    aug = a + np.eye(n)
    return aug / aug.sum(axis=-1, keepdims=True)


def _get_attention_rollout(attentions, input_length: int) -> np.ndarray:
    """(N, N) joint rollout matrix (reference attention_aggregation.py:47-78)."""
    attn = _reconstruct_attention_matrix(attentions, input_length)
    num_layers = attn.shape[0]
    joint = _augment(attn[0].mean(axis=0))
    for layer in range(1, num_layers):
        joint = _augment(attn[layer].mean(axis=0)) @ joint
    return joint


def _get_recurent_attention(attentions, position: int = 1) -> np.ndarray:
    """(L, H, num_generated-1) previous-token attention per step
    (reference attention_aggregation.py:81-107)."""
    num_generated = len(attentions)
    num_layers = len(attentions[0])
    num_heads = _to_np(attentions[0][0]).shape[1]
    out = np.zeros((num_layers, num_heads, num_generated - 1))
    for generated_idx, per_layer_attn in enumerate(attentions[1:]):
        for layer_idx, attn in enumerate(per_layer_attn):
            out[layer_idx, :, generated_idx] = _to_np(attn)[0, :, 0, -position - 1]
    return out


def _get_average_attention_all(attentions) -> np.ndarray:
    """(L, H, num_generated) mean attention over past tokens per step
    (reference attention_aggregation.py:110-134)."""
    num_generated = len(attentions)
    num_layers = len(attentions[0])
    num_heads = _to_np(attentions[0][0]).shape[1]
    out = np.zeros((num_layers, num_heads, num_generated))
    for generated_idx, per_layer_attn in enumerate(attentions):
        for layer_idx, attn in enumerate(per_layer_attn):
            out[layer_idx, :, generated_idx] = _to_np(attn)[0, :, 0, :].mean(axis=1)
    return out


class StreamingAttentionAggregator:
    """Streaming replacement for the dense attention reconstruction.

    Usage::

        agg = StreamingAttentionAggregator(input_length=P)
        agg.prefill(attentions_step0)          # per-layer (1, H, P, P)
        for step_attn in attentions[1:]:
            agg.step(step_attn)                # per-layer (1, H, 1, P+k)
        agg.rollout                            # == _get_attention_rollout(...)
        agg.prev_token_attention               # == _get_recurent_attention(...)
        agg.mean_past_attention                # == _get_average_attention_all(...)
    """

    def __init__(self, input_length: int, track_rollout: bool = True):
        self.input_length = input_length
        self.track_rollout = track_rollout
        self._prev_token: List[np.ndarray] = []
        self._mean_past: List[np.ndarray] = []
        self._partials: List[np.ndarray] = []  # L partial products, (n, n) each

    # -- rollout internals ---------------------------------------------------
    def _append_rows(self, layer_rows: List[np.ndarray]) -> None:
        """Append one (already augmented+normalized) row per layer to the
        partial products P_k = A_k @ ... @ A_1.

        Because every A_k is lower-triangular, existing rows of every P_k are
        unchanged; the new row of P_k is row @ P_{k-1} (P_0 = I).
        """
        n_new = layer_rows[0].shape[0]  # matrix size after append
        prev = None
        new_partials = []
        for k, row in enumerate(layer_rows):
            if prev is None:
                new_row = row
            else:
                new_row = row @ prev
            if k < len(self._partials):
                grown = np.zeros((n_new, n_new))
                old = self._partials[k]
                grown[: old.shape[0], : old.shape[1]] = old
                grown[n_new - 1, :] = new_row
            else:
                grown = new_row[None, :]
            new_partials.append(grown)
            prev = grown
        self._partials = new_partials

    # -- feeding --------------------------------------------------------------
    def prefill(self, attn: Sequence[np.ndarray]) -> None:
        """Seed with the prompt block: per-layer (1, H, P, P) self-attention.

        Also records the reference's quirky generated_idx=0 mean-past entry
        (row 0 of the prompt block, attention_aggregation.py:132) and the
        empty row P that the rollout augmentation turns into an identity row.
        """
        p = self.input_length
        mats = [_to_np(a)[0] for a in attn]  # (H, P, P) each
        self._mean_past.append(np.stack([m[:, 0, :].mean(axis=1) for m in mats]))
        if self.track_rollout:
            prev = None
            partials = []
            for m in mats:
                aug = _augment(m.mean(axis=0))
                prev = aug if prev is None else aug @ prev
                partials.append(prev.copy())
            self._partials = partials
            # Row P of the reconstruction stays empty -> identity row e_P.
            e = np.zeros(p + 1)
            e[p] = 1.0
            self._append_rows([e for _ in mats])

    def step(self, attn_rows: Sequence[np.ndarray]) -> None:
        """Feed one generated token's attention: per-layer (1, H, 1, t) with
        t = P + k for step k >= 1."""
        rows = [_to_np(a)[0, :, 0, :] for a in attn_rows]  # (H, t)
        t = rows[0].shape[-1]
        self._prev_token.append(np.stack([r[:, -2] for r in rows]))  # (L, H)
        self._mean_past.append(np.stack([r.mean(axis=1) for r in rows]))  # (L, H)
        if self.track_rollout:
            layer_rows = []
            for r in rows:
                # Matrix row index is t; attention spans columns [:t]; the
                # identity contribution lands at column t (reference quirk).
                full_row = np.zeros(t + 1)
                full_row[:t] = r.mean(axis=0)
                full_row[t] += 1.0
                layer_rows.append(full_row / full_row.sum())
            self._append_rows(layer_rows)

    # -- outputs ---------------------------------------------------------------
    @property
    def prev_token_attention(self) -> np.ndarray:
        """(L, H, num_generated-1) == _get_recurent_attention."""
        if not self._prev_token:
            return np.zeros((0, 0, 0))
        return np.stack(self._prev_token, axis=-1)

    @property
    def mean_past_attention(self) -> np.ndarray:
        """(L, H, num_generated) == _get_average_attention_all."""
        return np.stack(self._mean_past, axis=-1)

    @property
    def rollout(self) -> np.ndarray:
        """(N, N) joint rollout == _get_attention_rollout."""
        assert self.track_rollout, "rollout tracking disabled"
        return self._partials[-1]
