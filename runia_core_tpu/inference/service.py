"""Pipelined scoring service: the production serving loop.

The reference scores one image per ``get_score`` call inside a Python loop
(reference inference/image_level.py:96-120), so its throughput is bounded by
Python and host<->device latency. This service instead keeps a bounded window
of batches in flight on the device: enqueue is asynchronous under JAX, so as
long as results are consumed a few batches behind submission, the chip never
waits on the host and throughput equals the fused program's device rate
(bench.py measures the same regime). Host-side batch assembly runs in the
C++ gather/normalize kernel via :class:`runia_core_tpu.data.PrefetchLoader`
and overlaps device compute.

Usage::

    service = ScoringService(scorer, key=jax.random.key(0))
    for logits, scores in service.score_stream(batch_iter):
        ...                                   # numpy, arrives pipelined

    results = service.score_dataset(images_u8, batch_size=512)
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, Iterator, Optional, Tuple

import jax
import numpy as np

__all__ = ["ScoringService"]


class ScoringService:
    """Stream batches through a fused scorer with a bounded in-flight window.

    Args:
        scorer: ``(images, key) -> outputs`` jitted program — typically
            ``(logits, scores)`` from
            :func:`runia_core_tpu.inference.build_larex_scorer`, but any
            output pytree streams through unchanged.
        key: base PRNG key; per-batch keys are ``fold_in(key, batch_idx)``.
        max_in_flight: how many batches may be enqueued before the oldest
            result is fetched. Size it to at least link_round_trip /
            per_batch_compute so result fetches never stall the queue:
            2-4 suffices on a local PCIe host; remote/tunneled devices want
            8+ (measured on the tunneled test chip: window 3 -> 43k img/s,
            window 8 -> 97k, vs 103k with no result fetches at all).
            Memory cost is one output pytree per slot.
        check_finite: validate every fetched result and raise
            :class:`runia_core_tpu.utils.NonFiniteError` (naming the batch)
            on NaN/inf — a silent NaN score compares false against any OoD
            threshold and would pass as in-distribution.
    """

    def __init__(
        self,
        scorer: Callable,
        key: Optional[jax.Array] = None,
        max_in_flight: int = 8,
        check_finite: bool = False,
    ):
        if max_in_flight < 1:
            raise ValueError("max_in_flight must be >= 1")
        self.scorer = scorer
        self.key = key if key is not None else jax.random.key(0)
        self.max_in_flight = max_in_flight
        self.check_finite = check_finite
        self._batch_idx = 0

    def _submit(self, images) -> Tuple[Any, Any]:
        k = jax.random.fold_in(self.key, self._batch_idx)
        self._batch_idx += 1
        out = self.scorer(images, k)
        # Start the device->host copies now so they overlap the compute of
        # the batches behind them in the window; without this every result
        # fetch eats a full round-trip on remote/tunneled devices.
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        return out

    def _fetch(self, out, batch_idx: int):
        host = jax.tree_util.tree_map(np.asarray, out)
        if self.check_finite:
            from runia_core_tpu.utils import NonFiniteError, find_nonfinite

            bad = find_nonfinite(host)
            if bad:
                raise NonFiniteError(f"batch {batch_idx}: non-finite in {bad}")
        return host

    def score_stream(self, batches: Iterable[Any]) -> Iterator[Any]:
        """Yield one numpy output pytree per input batch, in order (for the
        LaREx scorer: (logits, scores) pairs).

        ``batches`` yields image arrays (or (images, *rest) tuples — extras
        are ignored). Results come out ``max_in_flight`` batches behind
        submission; the final drain flushes the window.
        """
        window: deque = deque()
        fetched = 0
        for batch in batches:
            images = batch[0] if isinstance(batch, tuple) else batch
            window.append(self._submit(images))
            if len(window) > self.max_in_flight:
                yield self._fetch(window.popleft(), fetched)
                fetched += 1
        while window:
            yield self._fetch(window.popleft(), fetched)
            fetched += 1

    def score_dataset(
        self,
        images_u8: np.ndarray,
        batch_size: int,
        scale: float = 1.0 / 255.0,
        offset: float = 0.0,
        resize_to: Optional[Tuple[int, int]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Score a whole uint8 dataset; returns (logits (N, C), scores (N,)).

        Batch assembly runs in the prefetching loader (C++ kernel when
        built); ``resize_to=(h, w)`` bilinear-resizes to the model's input
        size in the same host pass. A short final batch is padded up to
        ``batch_size`` so the compiled program is reused, and the padding
        rows are dropped from the output.
        """
        from runia_core_tpu.data import PrefetchLoader

        n = images_u8.shape[0]
        loader = PrefetchLoader(
            images_u8,
            batch_size=batch_size,
            shuffle=False,
            drop_remainder=False,
            scale=scale,
            offset=offset,
            device_put=False,  # the tail batch is padded on host first
            resize_to=resize_to,
        )

        def padded():
            for images, _ in loader:
                if images.shape[0] < batch_size:
                    pad = batch_size - images.shape[0]
                    images = np.concatenate(
                        [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
                    )
                yield images

        logits_parts, score_parts = [], []
        for logits, scores in self.score_stream(padded()):
            logits_parts.append(logits)
            score_parts.append(scores)
        logits = np.concatenate(logits_parts, axis=0)[:n]
        scores = np.concatenate(score_parts, axis=0)[:n]
        return logits, scores
