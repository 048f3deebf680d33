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

__all__ = [
    "PrefetchLoader",
    "gather_normalize",
    "gather_resize_normalize",
    "HAVE_NATIVE",
]


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


def _resize_bilinear_numpy(
    images: np.ndarray, h_out: int, w_out: int
) -> np.ndarray:
    """Half-pixel bilinear resize of (B, H, W, C) float32 — the native
    kernel's exact semantics (and jax.image.resize method='bilinear')."""
    b, h_in, w_in, c = images.shape
    sy = np.clip((np.arange(h_out) + 0.5) * h_in / h_out - 0.5, 0, h_in - 1)
    sx = np.clip((np.arange(w_out) + 0.5) * w_in / w_out - 0.5, 0, w_in - 1)
    y0 = sy.astype(np.int64)
    x0 = sx.astype(np.int64)
    y1 = np.minimum(y0 + 1, h_in - 1)
    x1 = np.minimum(x0 + 1, w_in - 1)
    fy = (sy - y0).astype(np.float32)[None, :, None, None]
    fx = (sx - x0).astype(np.float32)[None, None, :, None]
    p00 = images[:, y0][:, :, x0]
    p01 = images[:, y0][:, :, x1]
    p10 = images[:, y1][:, :, x0]
    p11 = images[:, y1][:, :, x1]
    top = p00 + fx * (p01 - p00)
    bot = p10 + fx * (p11 - p10)
    return top + fy * (bot - top)


def gather_resize_normalize(
    images_u8: np.ndarray,
    indices: np.ndarray,
    size: Tuple[int, int],
    scale: float = 1.0 / 255.0,
    offset: float = 0.0,
    num_threads: int = 4,
) -> np.ndarray:
    """(N, H, W, C) uint8 + indices -> (B, h, w, C) float32, bilinear-resized
    with half-pixel centers (jax.image.resize 'bilinear' semantics) and
    normalized, in one multithreaded GIL-releasing C++ pass. Serving
    pipelines with arbitrary-size inputs resize on the host, overlapped with
    TPU compute (numpy fallback is semantically identical).
    """
    images_u8 = np.ascontiguousarray(images_u8)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    assert images_u8.ndim == 4, "expect (N, H, W, C) uint8"
    n, h_in, w_in, channels = images_u8.shape
    h_out, w_out = size
    if HAVE_NATIVE:
        out = np.empty((len(indices), h_out, w_out, channels), np.float32)
        _native.gather_resize_normalize(
            images_u8.reshape(n, -1),
            indices,
            n,
            h_in,
            w_in,
            channels,
            h_out,
            w_out,
            float(scale),
            float(offset),
            int(num_threads),
            out.reshape(len(indices), -1),
        )
        return out
    batch = images_u8[indices].astype(np.float32)
    return _resize_bilinear_numpy(batch, h_out, w_out) * scale + offset


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
        resize_to: Optional[Tuple[int, int]] = None,
    ):
        assert images_u8.dtype == np.uint8, "PrefetchLoader expects uint8 images"
        assert resize_to is None or not bgr_to_rgb, (
            "resize_to and bgr_to_rgb are mutually exclusive (flip channels "
            "in the image bank instead)"
        )
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
        self.resize_to = resize_to
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
        stop = threading.Event()

        def put(item) -> bool:
            # Bounded put that notices consumer abandonment: a consumer that
            # breaks out of the loop sets `stop`, and the producer must not
            # block forever on a full queue (it would pin device-resident
            # batches in HBM and leak one thread per early exit).
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx in self._index_batches():
                    if stop.is_set():
                        return
                    if self.resize_to is not None:
                        batch = gather_resize_normalize(
                            self.images, idx, self.resize_to, self.scale,
                            self.offset, self.num_threads,
                        )
                    else:
                        batch = gather_normalize(
                            self.images, idx, self.scale, self.offset,
                            self.bgr_to_rgb, self.num_threads,
                        )
                    if self.device_put:
                        import jax

                        batch = jax.device_put(batch)
                    lab = self.labels[idx] if self.labels is not None else None
                    if not put((batch, lab)):
                        return
            except BaseException as exc:  # propagate to the consumer
                error.append(exc)
            finally:
                put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # Runs on normal exhaustion AND on generator close (early break):
            # release the producer, drain queued batches, reap the thread.
            stop.set()
            while not out_q.empty():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
            thread.join()
            if error:
                raise error[0]
            self._epoch += 1
