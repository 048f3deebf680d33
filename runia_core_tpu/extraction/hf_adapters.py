"""Adapters wrapping real HuggingFace detection models into the
DetectionResult protocol.

The reference drives actual framework models (ultralytics YOLO, detectron2
RCNN, HF DETR/RT-DETR/OWLv2) through its hook-based extractors
(reference abstract_classes.py:396-518: DETR inference goes through a
``forward_and_postprocess`` that thresholds the query logits and returns
boxes / logits / last_hidden per image, while the backbone feature map is
captured by a layer hook). This module is the TPU-native twin for the HF
DETR family: the torch model runs as-is (CPU/GPU), its outputs are
postprocessed into a :class:`DetectionResult`, and the captured backbone map
feeds the JAX RoI/scoring stack.

Works for any DETR-family ``*ForObjectDetection`` whose outputs carry
``logits`` (B, Q, num_labels+1) and ``pred_boxes`` (B, Q, 4) normalized
cxcywh, with the conv backbone reachable at ``model.model.backbone``
(DETR, ConditionalDETR, DeformableDETR share this layout).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from runia_core_tpu.extraction.adapters import DetectionResult

__all__ = ["HFDetrAdapter", "cxcywh_to_xyxy"]


def cxcywh_to_xyxy(boxes: np.ndarray, img_h: int, img_w: int) -> np.ndarray:
    """Normalized (cx, cy, w, h) -> absolute (x1, y1, x2, y2)."""
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    out = np.stack(
        [
            (cx - w / 2) * img_w,
            (cy - h / 2) * img_h,
            (cx + w / 2) * img_w,
            (cy + h / 2) * img_h,
        ],
        axis=-1,
    )
    return out.astype(np.float32)


class HFDetrAdapter:
    """``model(image, predict_conf) -> DetectionResult`` over a real HF
    DETR-family detector.

    Args:
        model: a ``transformers`` ``*ForObjectDetection`` (eval mode).
        backbone_level: which backbone pyramid level to expose as the fmap
            for RoI pooling (-1 = deepest, the reference's hooked layer).
    """

    def __init__(self, model: Any, backbone_level: int = -1):
        import torch  # the HF model side is torch by construction

        self._torch = torch
        self.model = model.eval()
        self.backbone_level = backbone_level
        # no-object is the trailing logit column in the DETR family
        self.num_labels = model.config.num_labels

    def _to_tensor(self, image) -> "Any":
        """Accepts (H, W, 3) numpy/array (our loader convention), a torch
        (3, H, W) CHW tensor (torch convention), or (1, 3, H, W)."""
        torch = self._torch
        was_tensor = torch.is_tensor(image)
        x = image if was_tensor else torch.from_numpy(np.asarray(image, np.float32))
        if x.ndim == 3:
            # torch-native tensors are channels-first by convention; numpy
            # inputs follow the HWC loader convention.
            if was_tensor and x.shape[0] == 3:
                x = x[None]
            else:
                x = x.permute(2, 0, 1)[None]
        return x

    def __call__(self, image, predict_conf: float = 0.25, **kw) -> DetectionResult:
        torch = self._torch
        x = self._to_tensor(image)
        try:
            x = x.to(next(self.model.parameters()).device)
        except StopIteration:  # parameterless stub models in tests
            pass
        img_h, img_w = int(x.shape[2]), int(x.shape[3])

        captured = {}

        def grab(_mod, _inp, out):
            captured["backbone"] = out

        hook = self.model.model.backbone.register_forward_hook(grab)
        try:
            with torch.no_grad():
                out = self.model(x)
        finally:
            hook.remove()

        # Reference postprocess (abstract_classes.py:503-518). Two scoring
        # schemes in the DETR family: classic DETR carries a trailing
        # no-object column and scores via softmax; ConditionalDETR /
        # DeformableDETR drop it and score via sigmoid (focal loss). The
        # logits width tells them apart.
        logits = out.logits[0]  # (Q, num_labels [+ 1])
        if logits.shape[-1] == self.num_labels + 1:
            probs = logits.softmax(-1)[:, :-1]
        else:
            probs = logits.sigmoid()
        scores, classes = probs.max(-1)

        def _np_host(t):  # GPU-resident models: always hop through host
            return t.detach().cpu().numpy()

        keep = _np_host(scores > predict_conf)
        boxes = cxcywh_to_xyxy(_np_host(out.pred_boxes[0]), img_h, img_w)[keep]
        features = _np_host(out.last_hidden_state[0])[keep]  # decoder queries

        feats, _pos = captured["backbone"]
        fmap = feats[self.backbone_level][0]  # (1, C, H', W') + its mask
        return DetectionResult(
            boxes=boxes,
            img_shape=(img_h, img_w),
            scores=_np_host(scores)[keep],
            classes=_np_host(classes)[keep].astype(np.int64),
            logits=_np_host(logits)[keep, : self.num_labels],
            features=features,
            fmaps=[_np_host(fmap)],
        )
