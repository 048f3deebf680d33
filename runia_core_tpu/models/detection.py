"""Built-in single-stage detection model + adapter.

The reference supports seven external detector families (ultralytics,
detectron2, HF) purely through output-structure adapters; this module adds a
self-contained flax detector so the whole object-level OoD stack — raw-head
logits recovery through NMS, ROIAlign feature extraction, per-detection
scoring, OSOD evaluation — runs end to end inside the framework (tests,
examples, benchmarks) with no external dependencies.

Architecture: a small convolutional backbone over NHWC images and a dense
per-cell head predicting (cx, cy, w, h, class scores) at one stride — a
deliberately minimal YOLO-style layout whose raw head output
(B, 4 + num_classes, num_cells) matches what ``yolo_get_logits`` expects
(extraction/adapters.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from runia_core_tpu.extraction.adapters import DetectionResult
from runia_core_tpu.ops.nms import nms_indices

__all__ = ["SimpleDetector", "JaxDetectorAdapter"]


class SimpleDetector(nn.Module):
    """Single-scale anchor-free detector with feature taps."""

    num_classes: int = 4
    features: int = 32
    stride: int = 8

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """(B, H, W, 3) -> (raw head (B, 4+nc, cells), taps dict)."""
        x = images
        taps = {}
        chans = self.features
        n_down = int(np.log2(self.stride))
        for i in range(n_down):
            x = nn.relu(nn.Conv(chans, (3, 3), strides=(2, 2), name=f"down{i}")(x))
            chans *= 2
        x = nn.relu(nn.Conv(chans, (3, 3), name="neck")(x))
        taps["pre_pool"] = x  # (B, H/s, W/s, C) — the ROI feature map

        head = nn.Conv(4 + self.num_classes + 1, (1, 1), name="head")(x)
        b, gh, gw, _ = head.shape
        # Decode cell-relative predictions into absolute xyxy + class probs.
        cy, cx = jnp.meshgrid(jnp.arange(gh), jnp.arange(gw), indexing="ij")
        centers = jnp.stack([cx, cy], axis=-1).reshape(-1, 2) * self.stride + self.stride / 2
        flat = head.reshape(b, gh * gw, -1)
        offsets = jnp.tanh(flat[..., :2]) * self.stride  # center offsets
        sizes = jax.nn.softplus(flat[..., 2:4]) * self.stride + 2.0
        obj = jax.nn.sigmoid(flat[..., 4])  # objectness
        cls_scores = jax.nn.softmax(flat[..., 5:], axis=-1) * obj[..., None]

        ctr = centers[None] + offsets
        x1y1 = ctr - sizes / 2
        x2y2 = ctr + sizes / 2
        boxes = jnp.concatenate([x1y1, x2y2], axis=-1)  # (B, cells, 4)

        # YOLO-style raw head: (B, 4 + nc, cells) with xyxy rows first.
        raw = jnp.concatenate(
            [jnp.transpose(boxes, (0, 2, 1)), jnp.transpose(cls_scores, (0, 2, 1))],
            axis=1,
        )
        return raw, taps


class JaxDetectorAdapter:
    """DetectionResult adapter around SimpleDetector.

    Implements the detection protocol used by BoxFeaturesExtractor /
    ObjectLevelInference: ``adapter(image, predict_conf) -> DetectionResult``
    with boxes from class-aware NMS, per-survivor log-class scores recovered
    from the raw head (the yolo_get_logits path), and the backbone feature
    map exposed for ROIAlign (NCHW).
    """

    def __init__(self, model: SimpleDetector, variables, iou_threshold: float = 0.5,
                 max_det: int = 100):
        self.model = model
        self.variables = variables
        self.iou_threshold = iou_threshold
        self.max_det = max_det
        self._forward = jax.jit(lambda imgs: model.apply(variables, imgs))

    def __call__(self, image, predict_conf: float = 0.25, **kwargs) -> DetectionResult:
        imgs = jnp.asarray(np.asarray(image, dtype=np.float32))
        if imgs.ndim == 3:
            imgs = imgs[None]
        raw, taps = self._forward(imgs)
        raw_np = np.asarray(raw)  # (1, 4+nc, cells)
        img_shape = (imgs.shape[1], imgs.shape[2])

        boxes = raw_np[0, :4].T  # (cells, 4) xyxy
        cls = raw_np[0, 4:].T  # (cells, nc)
        conf = cls.max(axis=1)
        labels = cls.argmax(axis=1)
        keep_conf = conf > predict_conf
        boxes, cls, conf, labels = (
            boxes[keep_conf], cls[keep_conf], conf[keep_conf], labels[keep_conf]
        )
        if boxes.shape[0] > 0:
            offset_boxes = boxes + labels[:, None] * 7680  # class-aware NMS
            keep = nms_indices(offset_boxes, conf, self.iou_threshold,
                               max_det=self.max_det)
        else:
            keep = np.zeros((0,), np.int64)
        fmap = jnp.transpose(taps["pre_pool"], (0, 3, 1, 2))  # NCHW for ROIAlign
        return DetectionResult(
            boxes=boxes[keep],
            img_shape=img_shape,
            scores=conf[keep],
            classes=labels[keep],
            logits=np.log(np.clip(cls[keep], 1e-10, None)),  # log class scores
            fmaps=[fmap],
            raw_prediction=raw_np,
            extra={"names": {i: f"class{i}" for i in range(self.model.num_classes)}},
        )
