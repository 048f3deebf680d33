"""Batched, padded object-level feature extraction and scoring.

The reference (and our API-compatible BoxFeaturesExtractor) processes one
image at a time with ragged per-image dicts. This module is the TPU-native
production path (SURVEY.md section 7.3 "Ragged detections"): detections are
padded to a static MAX_DET with validity masks, ROIAlign is vmapped over the
image batch, and per-detection OoD scoring fuses into one jitted program —
including the reference's whole-image fallback for detection-less images
(object_level.py:210-214) as a masked branch.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.ops.linalg import mahalanobis_quadform
from runia_core_tpu.ops.roi_align import roi_align

__all__ = [
    "PaddedDetections",
    "pad_detections",
    "batched_roi_features",
    "build_object_scorer",
]


@jax.tree_util.register_pytree_node_class
@dataclass
class PaddedDetections:
    """Fixed-shape detection batch: (B, MAX_DET, ...) + validity mask."""

    boxes: jnp.ndarray  # (B, M, 4) xyxy
    valid: jnp.ndarray  # (B, M) bool
    scores: Optional[jnp.ndarray] = None  # (B, M)
    classes: Optional[jnp.ndarray] = None  # (B, M)
    logits: Optional[jnp.ndarray] = None  # (B, M, C)

    def tree_flatten(self):
        return (self.boxes, self.valid, self.scores, self.classes, self.logits), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def pad_detections(
    per_image: Sequence[Dict[str, np.ndarray]],
    max_det: int,
    img_shape: Tuple[int, int],
    num_classes: Optional[int] = None,
) -> PaddedDetections:
    """Pad ragged per-image detections to (B, MAX_DET, ...).

    Images with zero detections get the whole-image box at slot 0 with
    ``valid=True`` — the reference's fallback — tagged in ``scores`` as 0.
    Overflow beyond ``max_det`` is truncated (highest-score first if scores
    are provided).
    """
    b = len(per_image)
    boxes = np.zeros((b, max_det, 4), np.float32)
    valid = np.zeros((b, max_det), bool)
    scores = np.zeros((b, max_det), np.float32)
    classes = np.zeros((b, max_det), np.int32)
    c = num_classes
    logits = None
    for i, det in enumerate(per_image):
        det_boxes = np.asarray(det.get("boxes", np.zeros((0, 4)))).reshape(-1, 4)
        n = det_boxes.shape[0]
        order = np.arange(n)
        if n > max_det and "scores" in det:
            order = np.argsort(-np.asarray(det["scores"]))[:max_det]
        elif n > max_det:
            order = order[:max_det]
        n_keep = len(order) if n > 0 else 0
        if n_keep == 0:
            boxes[i, 0] = [0.0, 0.0, img_shape[1], img_shape[0]]
            valid[i, 0] = True
            continue
        boxes[i, :n_keep] = det_boxes[order]
        valid[i, :n_keep] = True
        if "scores" in det:
            scores[i, :n_keep] = np.asarray(det["scores"])[order]
        if "classes" in det:
            classes[i, :n_keep] = np.asarray(det["classes"])[order]
        if "logits" in det:
            det_logits = np.asarray(det["logits"])
            if logits is None:
                c = c or det_logits.shape[-1]
                logits = np.zeros((b, max_det, c), np.float32)
            logits[i, :n_keep] = det_logits[order]
    return PaddedDetections(
        boxes=jnp.asarray(boxes),
        valid=jnp.asarray(valid),
        scores=jnp.asarray(scores),
        classes=jnp.asarray(classes),
        logits=jnp.asarray(logits) if logits is not None else None,
    )


@partial(jax.jit, static_argnames=("output_sizes", "img_shape", "sampling_ratio"))
def batched_roi_features(
    fmaps: Tuple[jnp.ndarray, ...],
    boxes: jnp.ndarray,
    img_shape: Tuple[int, int],
    output_sizes: Tuple[int, ...],
    sampling_ratio: int = -1,
) -> jnp.ndarray:
    """Per-detection channel-mean ROI features for a whole image batch.

    Args:
        fmaps: per-level (B, C_l, H_l, W_l) feature maps.
        boxes: (B, M, 4) padded boxes.

    Returns:
        (B, M, sum_l C_l) features (garbage in padded rows — mask downstream).
    """
    outs = []
    for fmap, out_size in zip(fmaps, output_sizes):
        scale = fmap.shape[3] / img_shape[1]

        def one_image(fm, bx, out_size=out_size, scale=scale):
            rois = roi_align(fm, bx, int(out_size), scale, sampling_ratio, True)
            return jnp.mean(rois, axis=(2, 3))  # (M, C_l)

        outs.append(jax.vmap(one_image)(fmap, boxes))  # (B, M, C_l)
    return jnp.concatenate(outs, axis=-1)


def build_object_scorer(
    apply_fn: Callable,
    detector_state: Dict[str, jnp.ndarray],
    output_sizes: Tuple[int, ...],
    img_shape: Tuple[int, int],
    pca_state=None,
    fmap_taps: Tuple[str, ...] = ("pre_pool",),
    sampling_ratio: int = -1,
) -> Callable:
    """Fuse backbone forward -> batched ROIAlign -> Mahalanobis scoring into
    one jitted program over padded detections.

    Args:
        apply_fn: images -> (outputs, taps) tapped forward; taps hold NHWC
            maps which are transposed once inside the program.
        detector_state: {"feats_mean", "precision"} (LaREM).

    Returns:
        jitted (images, PaddedDetections) -> (B, M) scores with -inf in
        padded rows.
    """
    from runia_core_tpu.reduction import pca_transform

    @jax.jit
    def score(images, dets: PaddedDetections):
        _, taps = apply_fn(images)
        fmaps = tuple(
            jnp.transpose(taps[name], (0, 3, 1, 2)) for name in fmap_taps
        )
        feats = batched_roi_features(
            fmaps, dets.boxes, img_shape, tuple(output_sizes), sampling_ratio
        )  # (B, M, D)
        b, m, d = feats.shape
        flat = feats.reshape(b * m, d)
        if pca_state is not None:
            flat = pca_transform(pca_state, flat)
        s = -mahalanobis_quadform(
            flat, detector_state["feats_mean"], detector_state["precision"]
        ).reshape(b, m)
        return jnp.where(dets.valid, s, -jnp.inf)

    return score
