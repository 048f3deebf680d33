"""Prefetching data loader with a native host-side batch-assembly kernel.

The reference leans on torch's C++ DataLoader for its input pipeline; this is
the TPU-host equivalent: a background-thread prefetcher whose hot loop —
gathering uint8 images by index into a normalized float32 batch (optional
BGR->RGB flip, reference runia_core/yolov8.py:41-43) — runs in the
multithreaded C++ extension (native/dataloader.cpp), which releases the GIL
so batch assembly overlaps TPU compute. Falls back to a numpy implementation
when the extension isn't built.

Usage::

    loader = PrefetchLoader(images_u8, labels, batch_size=512, shuffle=True)
    for images, labels in loader:   # images are float32, already on device
        scores = scorer(images, key)
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    from runia_core_tpu import _native  # built from native/dataloader.cpp

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover
    _native = None
    HAVE_NATIVE = False

__all__ = ["PrefetchLoader", "gather_normalize", "HAVE_NATIVE"]


def gather_normalize(
    images_u8: np.ndarray,
    indices: np.ndarray,
    scale: float = 1.0 / 255.0,
    offset: float = 0.0,
    bgr_to_rgb: bool = False,
    num_threads: int = 4,
) -> np.ndarray:
    """(N, H, W, C) uint8 + batch indices -> (B, H, W, C) float32.

    Uses the native kernel when available; numpy otherwise (identical
    results).
    """
    images_u8 = np.ascontiguousarray(images_u8)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    batch_shape = (len(indices),) + images_u8.shape[1:]
    if HAVE_NATIVE:
        out = np.empty(batch_shape, np.float32)
        img_elems = int(np.prod(images_u8.shape[1:]))
        channels = int(images_u8.shape[-1])
        _native.gather_normalize(
            images_u8.reshape(images_u8.shape[0], -1),
            indices,
            images_u8.shape[0],
            img_elems,
            channels,
            float(scale),
            float(offset),
            int(bgr_to_rgb),
            int(num_threads),
            out.reshape(len(indices), -1),
        )
        return out
    batch = images_u8[indices].astype(np.float32) * scale + offset
    if bgr_to_rgb and images_u8.shape[-1] == 3:
        batch = batch[..., ::-1]
    return np.ascontiguousarray(batch)


class PrefetchLoader:
    """Double-buffered batch loader over an in-memory uint8 image bank.

    A background thread assembles the next batch (native C++ kernel) and
    optionally pushes it to the accelerator while the current batch is being
    consumed.
    """

    def __init__(
        self,
        images_u8: np.ndarray,
        labels: Optional[np.ndarray] = None,
        batch_size: int = 256,
        shuffle: bool = False,
        seed: int = 0,
        scale: float = 1.0 / 255.0,
        offset: float = 0.0,
        bgr_to_rgb: bool = False,
        num_threads: int = 4,
        device_put: bool = True,
        drop_remainder: bool = False,
        prefetch_depth: int = 2,
    ):
        assert images_u8.dtype == np.uint8, "PrefetchLoader expects uint8 images"
        self.images = np.ascontiguousarray(images_u8)
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.scale = scale
        self.offset = offset
        self.bgr_to_rgb = bgr_to_rgb
        self.num_threads = num_threads
        self.device_put = device_put
        self.drop_remainder = drop_remainder
        self.prefetch_depth = prefetch_depth
        self._epoch = 0

    def __len__(self) -> int:
        n = self.images.shape[0]
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = self.images.shape[0]
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_remainder else n
        for start in range(0, stop, self.batch_size):
            yield order[start : start + self.batch_size]

    def __iter__(self) -> Iterator[Tuple]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        sentinel = object()
        error: list = []

        def producer():
            try:
                for idx in self._index_batches():
                    batch = gather_normalize(
                        self.images, idx, self.scale, self.offset,
                        self.bgr_to_rgb, self.num_threads,
                    )
                    if self.device_put:
                        import jax

                        batch = jax.device_put(batch)
                    lab = self.labels[idx] if self.labels is not None else None
                    out_q.put((batch, lab))
            except BaseException as exc:  # propagate to the consumer
                error.append(exc)
            finally:
                out_q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            yield item
        thread.join()
        if error:
            raise error[0]
        self._epoch += 1
