"""YOLOv8 adapter: fast-MCD latent extraction with BGR->RGB loader shim.

TPU-native equivalent of reference runia_core/yolov8.py:12-53. The reference
subclass re-implements get_ls_samples to flip torch-dataloader BGR images to
RGB before feeding ultralytics; here the flip happens in a loader adapter and
the extraction runs through the batch-first FastMCDSamplesExtractor. The
reference's latent AttributeError (``self.return_variances`` is referenced
but never defined, yolov8.py:33-34 — SURVEY.md section 7.4) is fixed: the
flag exists and defaults to False.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Union

import numpy as np

from runia_core_tpu.extraction.image_level import FastMCDSamplesExtractor

__all__ = ["FastMCDSamplesExtractorYolov8"]


def _bgr_to_rgb_nhwc(image: np.ndarray) -> np.ndarray:
    """(C, H, W) BGR (torch-loader layout) -> contiguous (H, W, C) RGB."""
    return np.ascontiguousarray(np.asarray(image).transpose(1, 2, 0)[..., ::-1])


class FastMCDSamplesExtractorYolov8(FastMCDSamplesExtractor):
    """Fast-MCD extractor for YOLOv8-style tapped models.

    The model is a tapped forward (images -> (outputs, taps)); dataloaders
    may yield torch-style (C, H, W) BGR tensors which are converted to the
    NHWC RGB layout the adapted model expects (reference yolov8.py:41-43).
    """

    def __init__(self, *args, return_variances: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.return_variances = return_variances

    def get_ls_samples(self, data_loader: Iterable, **kwargs) -> Dict[str, np.ndarray]:
        def adapted():
            for image, label in data_loader:
                arr = np.asarray(image)
                if arr.ndim == 4 and arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):
                    arr = np.stack([_bgr_to_rgb_nhwc(im) for im in arr])
                elif arr.ndim == 3 and arr.shape[0] in (1, 3):
                    arr = _bgr_to_rgb_nhwc(arr)[None]
                yield arr, label

        return super().get_ls_samples(adapted(), **kwargs)
