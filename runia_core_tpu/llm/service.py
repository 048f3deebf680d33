"""Dynamic request batching for LLM generation (serving loop).

The LLM counterpart of :class:`runia_core_tpu.inference.ScoringService`:
callers submit individual prompts and get futures; a background worker
coalesces waiting requests into batches (up to ``max_batch``, waiting at
most ``max_wait_s`` for stragglers) and decodes each batch in one fused
``JaxGenerator.generate_batch`` program — per-request decode wastes the
chip on batch-size-1 forwards, and a static server-side batch size wastes
latency when traffic is light. No reference equivalent (its LLM path is
one blocking HF ``generate`` per call).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Dict, Optional, Sequence

import numpy as np

__all__ = ["GenerationService"]


class GenerationService:
    """Batches concurrent generation requests through one JaxGenerator.

    Usage::

        service = GenerationService(generator, max_batch=32)
        futures = [service.submit(ids) for ids in prompts]
        results = [f.result() for f in futures]   # per-request dicts
        service.close()

    Each result carries ``sequences`` (1, P+T), ``log_probs`` (T,), and
    ``prompt_length``. Decoding parameters (sampling, temperature, token
    budget) come from the service, not per request — one compiled program
    per (batch, prompt-length) shape serves everyone.
    """

    def __init__(
        self,
        generator,
        max_batch: int = 32,
        max_wait_s: float = 0.01,
        do_sample: bool = False,
        temperature: float = 1.0,
        length_bucket: int = 16,
        top_k: int = 0,
        top_p: float = 1.0,
    ):
        self.generator = generator
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_s)
        self.do_sample = do_sample
        self.temperature = temperature
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        # jit specializes per (batch, padded-length) shape; padding the
        # longest prompt up to a bucket multiple collapses the shape space
        # so steady-state traffic reuses a handful of compiled programs
        # instead of compiling per distinct length (expensive on tunneled
        # links especially). The left-pad mask makes the extra slots inert.
        self.length_bucket = max(1, int(length_bucket))
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, prompt_tokens: Sequence[int]) -> "Future[Dict[str, Any]]":
        """Enqueue one prompt; returns a future resolving to its result."""
        if self._closed:
            raise RuntimeError("GenerationService is closed")
        future: Future = Future()
        self._queue.put((list(prompt_tokens), future))
        return future

    def _collect(self):
        """Block for the first request, then soak up stragglers."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        if first is None:
            return None
        batch = [first]
        # One bounded wait for the batch to fill (cheap compared to decode).
        import time

        t_end = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = t_end - time.perf_counter()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-post the shutdown signal
                break
            batch.append(item)
        return batch

    def _run(self):
        while True:
            batch = self._collect()
            if batch is None:
                return
            if not batch:
                if self._closed:
                    return
                continue
            prompts = [p for p, _ in batch]
            futures = [f for _, f in batch]
            try:
                longest = max(len(p) for p in prompts)
                bucket = self.length_bucket
                pad_to = -(-longest // bucket) * bucket
                # Fill the batch axis too: (max_batch, bucketed-length) is
                # then the ONLY compiled shape, whatever the traffic looks
                # like; filler rows reuse the first prompt and are dropped.
                n_real = len(prompts)
                filled = prompts + [prompts[0]] * (self.max_batch - n_real)
                out = self.generator.generate_batch(
                    filled,
                    do_sample=self.do_sample,
                    temperature=self.temperature,
                    top_k=self.top_k,
                    top_p=self.top_p,
                    output_scores=False,
                    pad_to=pad_to,
                )
                for i, future in enumerate(futures):
                    p_len = len(prompts[i])
                    seq = np.asarray(out["sequences"][i])
                    # left-padding: strip to this request's real tokens
                    start = seq.shape[0] - (
                        p_len + self.generator.max_new_tokens
                    )
                    future.set_result({
                        "sequences": seq[None, start:],
                        "log_probs": np.asarray(out["log_probs"][i]),
                        "prompt_length": p_len,
                    })
            except BaseException as exc:  # propagate per request
                for future in futures:
                    if not future.done():
                        future.set_exception(exc)

    def close(self) -> None:
        """Drain outstanding requests, then stop the worker."""
        if not self._closed:
            self._closed = True
            self._queue.put(None)
            self._worker.join()
