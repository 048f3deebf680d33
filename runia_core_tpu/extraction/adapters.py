"""Detection-architecture adapters and the YOLO logits-recovery path.

The reference supports 7 detector families by unpacking their
framework-specific output structures and hook layouts (reference:
runia_core/feature_extraction/abstract_classes.py:249-715). The TPU-native
design replaces torch hooks with a *detection protocol*: an adapted model is
a callable

    model(image, predict_conf, **kw) -> DetectionResult

returning boxes/scores/classes plus the named feature maps the extractor
needs. Architecture-specific quirks (YOLO raw-head logits recovery through
NMS, OWLv2 patch-grid reshape, RT-DETR encoder permute, DINO level
selection) are handled here, mirroring the reference's dispatch
(abstract_classes.py:410-603) so the same seven architecture strings work.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.ops.nms import nms_indices

__all__ = [
    "SUPPORTED_OBJECT_DETECTION_ARCHITECTURES",
    "DetectionResult",
    "yolo_get_logits",
    "postprocess_architecture_taps",
]

SUPPORTED_OBJECT_DETECTION_ARCHITECTURES = [
    "yolov8",
    "rcnn",
    "detr-backbone",
    "owlv2",
    "rtdetr-backbone",
    "rtdetr-encoder",
    "dino",
]


@dataclass
class DetectionResult:
    """Structured output of an adapted detection model.

    Fields mirror what the reference scrapes out of each framework
    (abstract_classes.py:437-518):
      boxes (N, 4) xyxy in image coords; scores (N,); classes (N,);
      logits (N, C) per-detection classification logits (optional);
      features (N, d) per-detection embedding (optional);
      fmaps: list of (1, C, H, W) feature maps for ROI pooling;
      raw_prediction: the YOLO-style raw head output (1, 4 + nc, anchors)
        for logits recovery (optional);
      img_shape: (height, width).
    """

    boxes: np.ndarray
    img_shape: Tuple[int, int]
    scores: Optional[np.ndarray] = None
    classes: Optional[np.ndarray] = None
    logits: Optional[np.ndarray] = None
    features: Optional[np.ndarray] = None
    fmaps: List[Any] = field(default_factory=list)
    raw_prediction: Optional[np.ndarray] = None
    extra: Dict[str, Any] = field(default_factory=dict)


def yolo_get_logits(
    prediction,
    conf_thres: float,
    iou_thres: float,
    classes=None,
    agnostic: bool = False,
    multi_label: bool = False,
    max_det: int = 300,
    nc: int = 0,
    max_nms: int = 30000,
    max_wh: int = 7680,
) -> np.ndarray:
    """Recover per-surviving-detection class log-probabilities from a raw
    YOLOv8 head output by replaying its NMS.

    Behavior-equivalent to reference abstract_classes.py:605-715: candidate
    filter at ``conf_thres`` on the class max, best-class selection,
    class-offset NMS, then ``log`` of the class scores of the NMS survivors.
    The suppression itself runs through our XLA NMS.

    Args:
        prediction: (bs, 4 + nc [+ nm], anchors) raw head output.

    Returns:
        (n_survivors, nc) numpy array of log class scores.
    """
    assert 0 <= conf_thres <= 1, (
        f"Invalid Confidence threshold {conf_thres}, valid values are between 0.0 and 1.0"
    )
    assert 0 <= iou_thres <= 1, f"Invalid IoU {iou_thres}, valid values are between 0.0 and 1.0"
    prediction = np.asarray(prediction)
    bs = prediction.shape[0]
    nc = nc or (prediction.shape[1] - 4)
    nm = prediction.shape[1] - nc - 4
    mi = 4 + nc
    xc = prediction[:, 4:mi].max(1) > conf_thres  # candidates

    multi_label &= nc > 1
    prediction = prediction.transpose(0, 2, 1)  # (bs, anchors, 4+nc+nm)

    output = [np.zeros((0, nc)) for _ in range(bs)]
    for xi, x in enumerate(prediction):
        x = x[xc[xi]]
        if not x.shape[0]:
            continue
        box, cls, mask = np.split(x, [4, 4 + nc], axis=1)
        # cls_rows tracks the per-row class-score vectors through EVERY
        # transform applied to x below (class filter, truncation) — NMS
        # survivor indices select logits, so any misalignment silently
        # corrupts every downstream OoD score.
        if multi_label:
            i, j = np.where(cls > conf_thres)
            x = np.concatenate(
                [box[i], x[i, 4 + j, None], j[:, None].astype(np.float32), mask[i]], 1
            )
            cls_rows = cls[i]
        else:
            conf = cls.max(1, keepdims=True)
            j = cls.argmax(1, keepdims=True)
            sel = conf.ravel() > conf_thres
            x = np.concatenate([box, conf, j.astype(np.float32), mask], 1)[sel]
            cls_rows = cls[sel]
        if classes is not None:
            sel = np.isin(x[:, 5].astype(int), np.asarray(classes))
            x = x[sel]
            cls_rows = cls_rows[sel]
        n = x.shape[0]
        if not n:
            continue
        if n > max_nms:
            order = np.argsort(-x[:, 4])[:max_nms]
            x = x[order]
            cls_rows = cls_rows[order]

        c = x[:, 5:6] * (0 if agnostic else max_wh)
        scores = x[:, 4]
        boxes = x[:, :4] + c
        keep = nms_indices(boxes, scores, iou_thres, max_det=max_det)
        # Zero class probabilities intentionally map to -inf logits (the
        # reference's torch.log does the same, silently); suppress only the
        # divide-by-zero warning so real warnings stay visible.
        with np.errstate(divide="ignore"):
            output[xi] = np.log(cls_rows[keep])
    return np.concatenate(output, axis=0)


def postprocess_architecture_taps(
    architecture: str,
    latent_sample: List[Any],
    rcnn_extraction_type: Optional[str] = None,
    owlv2_hidden_size: Optional[int] = None,
    owlv2_patch_grid: Optional[int] = None,
) -> List[jnp.ndarray]:
    """Architecture-specific massaging of captured feature maps into
    (1, C, H, W) tensors ready for ROIAlign.

    Mirrors reference abstract_classes.py:520-603:
      - rcnn 'backbone': dict of pyramid levels -> list of tensors;
      - rcnn 'rpn_head': (objectness_logits, anchor_deltas) tuple ->
        channel-concatenated per level;
      - owlv2: (1, 1 + P*P, hidden) token sequence -> drop CLS, reshape to
        (1, hidden, P, P);
      - dino: take encoder level [1][2];
      - rtdetr-encoder: (1, HW, 256) -> permute -> (1, 256, 20, 20).
    """
    if architecture == "rcnn" and rcnn_extraction_type == "backbone":
        if len(latent_sample) == 1 and isinstance(latent_sample[0], dict):
            latent_sample = [v for _, v in latent_sample[0].items()]
    if (
        architecture == "rcnn"
        and rcnn_extraction_type == "rpn_head"
        and len(latent_sample) == 1
        and isinstance(latent_sample[0], tuple)
        and len(latent_sample[0]) == 2
    ):
        latent_sample = [
            jnp.concatenate([jnp.asarray(obj_logit), jnp.asarray(anch_delta)], axis=1)
            for obj_logit, anch_delta in zip(latent_sample[0][0], latent_sample[0][1])
        ]
    if architecture == "owlv2":
        tokens = jnp.asarray(latent_sample[0][0] if isinstance(latent_sample[0], (tuple, list))
                             else latent_sample[0])
        if tokens.ndim == 2:
            tokens = tokens[None]
        hidden = owlv2_hidden_size or tokens.shape[-1]
        grid = owlv2_patch_grid or int(np.sqrt(tokens.shape[1] - 1))
        latent_sample = [
            jnp.transpose(tokens[:, 1:, :], (0, 2, 1)).reshape(1, hidden, grid, grid)
        ]
    if architecture == "dino":
        latent_sample = [jnp.asarray(latent_sample[0][1][2])]
    if architecture == "rtdetr-encoder":
        first = latent_sample[0][0] if isinstance(latent_sample[0], (tuple, list)) else latent_sample[0]
        first = jnp.asarray(first)
        if first.ndim == 2:
            first = first[None]
        latent_sample = [jnp.transpose(first, (0, 2, 1)).reshape(-1, 256, 20, 20)]
    return [jnp.asarray(t) for t in latent_sample]
