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


def _step_rows(per_layer_attn) -> np.ndarray:
    """Stack one generated step's per-layer attention rows into (L, H, t)."""
    return np.stack([_batch1(_to_np(a))[:, 0, :] for a in per_layer_attn])


def _batch1(a: np.ndarray) -> np.ndarray:
    """Strip a size-1 batch axis, raising loudly for batched inputs (these
    aggregators are per-sequence; silently taking row 0 of a batched
    generate would compute uncertainty on the wrong sequence)."""
    if a.shape[0] != 1:
        raise ValueError(
            f"attention aggregation expects batch 1, got batch {a.shape[0]}"
        )
    return a[0]


def _reconstruct_attention_matrix(attentions, input_length: int) -> np.ndarray:
    """Rebuild the dense (L, H, N, N) attention map from incremental HF
    outputs (behavioral parity with reference attention_aggregation.py:5-44,
    vectorized over layers and heads).

    Step 0 contributes the (P, P) prompt self-attention block; step k >= 1
    contributes one length-(P+k) row, stored at matrix row P+k (so row P
    stays empty — see the module docstring)."""
    prompt_block = np.stack(
        [_batch1(_to_np(a)) for a in attentions[0]]
    )  # (L, H, P, P)
    num_layers, num_heads = prompt_block.shape[:2]
    total = input_length + len(attentions)

    full = np.zeros((num_layers, num_heads, total, total))
    full[:, :, :input_length, :input_length] = prompt_block
    for k, per_layer_attn in enumerate(attentions[1:], start=1):
        row = input_length + k
        full[:, :, row, :row] = _step_rows(per_layer_attn)
    return full


def _augment(a: np.ndarray) -> np.ndarray:
    """(mean-head attention + I) row-normalized (Abnar & Zuidema rollout).
    Works on a single (N, N) matrix or a stacked (L, N, N) batch."""
    aug = a + np.eye(a.shape[-1])
    return aug / aug.sum(axis=-1, keepdims=True)


def _get_attention_rollout(attentions, input_length: int) -> np.ndarray:
    """(N, N) joint rollout matrix (parity with reference
    attention_aggregation.py:47-78): augment every head-averaged layer at
    once, then left-multiply up the stack."""
    per_layer = _augment(
        _reconstruct_attention_matrix(attentions, input_length).mean(axis=1)
    )
    joint = per_layer[0]
    for layer in per_layer[1:]:
        joint = layer @ joint
    return joint


def _get_recurent_attention(attentions, position: int = 1) -> np.ndarray:
    """(L, H, num_generated-1) previous-token attention per step (parity with
    reference attention_aggregation.py:81-107): column ``-position-1`` of each
    generated step's attention row."""
    steps = [_step_rows(s)[..., -position - 1] for s in attentions[1:]]
    if not steps:
        num_heads = _to_np(attentions[0][0]).shape[1]
        return np.zeros((len(attentions[0]), num_heads, 0))
    return np.stack(steps, axis=-1)


def _get_average_attention_all(attentions) -> np.ndarray:
    """(L, H, num_generated) mean attention over past tokens per step (parity
    with reference attention_aggregation.py:110-134). Step 0 uses row 0 of
    the prompt block — the reference's generated_idx=0 quirk."""
    return np.stack([_step_rows(s).mean(axis=-1) for s in attentions], axis=-1)


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
