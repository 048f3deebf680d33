"""YOLOv8 detection architecture in flax, with an ultralytics converter.

The reference consumes ultralytics YOLOv8 checkpoints as external torch
models (reference runia_core/yolov8.py drives them through hooks and the
raw-head NMS replay, abstract_classes.py:605-715). This module makes those
checkpoints TPU-native: :func:`convert_ultralytics_yolov8` maps an
ultralytics ``model.state_dict()`` (the ``model.{i}.*`` detection layout)
onto a flax :class:`YoloV8` whose eval forward reproduces the torch
prediction tensor (parity pinned by tests/test_yolov8_convert.py), so the
whole object-level OoD stack — ``yolo_get_logits`` NMS replay, ROI feature
extraction, per-detection scoring — runs with no ultralytics/torch in the
serving path.

Architecture (anchor-free v8 detect):
  CSP backbone (Conv/C2f/SPPF) -> PAN-FPN neck (upsample+concat C2f top-down,
  strided-Conv+concat C2f bottom-up) -> per-scale decoupled heads (box branch
  predicts 4*reg_max DFL logits, class branch nc logits) -> DFL expectation
  -> dist2bbox against cell-center anchors -> (B, 4+nc, sum HW) predictions
  in xywh+scores layout, exactly what ``extraction/adapters.py::
  yolo_get_logits`` consumes.

Taps: ``p3``/``p4``/``p5`` neck feature maps (NHWC — the RoI sources),
``backbone_p5`` (post-SPPF map, the reference's hooked layer).

Ultralytics conventions preserved: BatchNorm eps=1e-3, SiLU activations,
symmetric k//2 conv padding, nearest-neighbor 2x upsampling, anchor points
at cell centers (+0.5) with strides (8, 16, 32).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["YoloV8", "YoloV8JaxAdapter", "convert_ultralytics_yolov8", "yolov8_widths"]

_BN_EPS = 1e-3  # ultralytics BatchNorm2d(eps=0.001)


class ConvBNSiLU(nn.Module):
    """ultralytics ``Conv``: conv (no bias, symmetric k//2 pad) + BN + SiLU."""

    features: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=_BN_EPS, momentum=0.97,
            name="bn",
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """Two 3x3 Convs with optional residual (ultralytics Bottleneck e=1.0
    as used inside C2f)."""

    features: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNSiLU(self.features, 3, name="cv1")(x, train)
        y = ConvBNSiLU(self.features, 3, name="cv2")(y, train)
        return x + y if self.shortcut else y


class C2f(nn.Module):
    """Cross-stage partial block: split cv1's output, chain n bottlenecks,
    concat every intermediate, fuse with cv2."""

    features: int
    n: int = 1
    shortcut: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBNSiLU(2 * c, 1, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, name=f"m{i}")(parts[-1], train)
            )
        return ConvBNSiLU(self.features, 1, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three chained stride-1 max-pools."""

    features: int
    pool: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        y = ConvBNSiLU(c, 1, name="cv1")(x, train)
        pad = self.pool // 2
        pools = [y]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (self.pool, self.pool), strides=(1, 1),
                    padding=[(pad, pad), (pad, pad)],
                )
            )
        return ConvBNSiLU(self.features, 1, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


def _upsample2x(x):
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)


def yolov8_widths(scale: str = "n") -> Dict[str, Any]:
    """(depth, width, ratio)-resolved channel plan for the v8 scales."""
    d, w, r = {
        "n": (1 / 3, 0.25, 2.0),
        "s": (1 / 3, 0.50, 2.0),
        "m": (2 / 3, 0.75, 1.5),
        "l": (1.0, 1.00, 1.0),
        "x": (1.0, 1.25, 1.0),
    }[scale]
    ch = lambda c: int(round(c * w))
    rep = lambda n: max(1, round(n * d))
    return {
        "c1": ch(64), "c2": ch(128), "c3": ch(256), "c4": ch(512),
        "c5": int(round(512 * w * r)),
        "n_small": rep(3), "n_big": rep(6),
    }


class YoloV8(nn.Module):
    """Anchor-free YOLOv8 detector. Returns (predictions, taps) where
    ``predictions`` is the ultralytics eval tensor (B, 4+nc, sum HW):
    decoded xywh boxes (pixel units) followed by sigmoid class scores."""

    num_classes: int
    scale: str = "n"
    reg_max: int = 16

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = yolov8_widths(self.scale)
        c1, c2, c3, c4, c5 = (cfg[k] for k in ("c1", "c2", "c3", "c4", "c5"))
        ns, nb = cfg["n_small"], cfg["n_big"]
        taps: Dict[str, jnp.ndarray] = {}

        # -- backbone ---------------------------------------------------------
        x = ConvBNSiLU(c1, 3, 2, name="layer0")(images, train)
        x = ConvBNSiLU(c2, 3, 2, name="layer1")(x, train)
        x = C2f(c2, ns, True, name="layer2")(x, train)
        x = ConvBNSiLU(c3, 3, 2, name="layer3")(x, train)
        p3 = C2f(c3, nb, True, name="layer4")(x, train)          # stride 8
        x = ConvBNSiLU(c4, 3, 2, name="layer5")(p3, train)
        p4 = C2f(c4, nb, True, name="layer6")(x, train)          # stride 16
        x = ConvBNSiLU(c5, 3, 2, name="layer7")(p4, train)
        x = C2f(c5, ns, True, name="layer8")(x, train)
        p5 = SPPF(c5, name="layer9")(x, train)                   # stride 32
        taps["backbone_p5"] = p5

        # -- PAN-FPN neck -------------------------------------------------------
        x = jnp.concatenate([_upsample2x(p5), p4], axis=-1)      # 10, 11
        n4 = C2f(c4, ns, False, name="layer12")(x, train)
        x = jnp.concatenate([_upsample2x(n4), p3], axis=-1)      # 13, 14
        n3 = C2f(c3, ns, False, name="layer15")(x, train)        # P3 out
        x = ConvBNSiLU(c3, 3, 2, name="layer16")(n3, train)
        x = jnp.concatenate([x, n4], axis=-1)                    # 17
        h4 = C2f(c4, ns, False, name="layer18")(x, train)        # P4 out
        x = ConvBNSiLU(c4, 3, 2, name="layer19")(h4, train)
        x = jnp.concatenate([x, p5], axis=-1)                    # 20
        h5 = C2f(c5, ns, False, name="layer21")(x, train)        # P5 out
        taps["p3"], taps["p4"], taps["p5"] = n3, h4, h5

        # -- decoupled detect heads ---------------------------------------------
        levels = (n3, h4, h5)
        strides = (8, 16, 32)
        cb = max(16, c3 // 4, self.reg_max * 4)
        cc = max(c3, min(self.num_classes, 100))

        flat_box, flat_cls, anchors, stride_vec = [], [], [], []
        for li, (feat, stride) in enumerate(zip(levels, strides)):
            b_, h, w, _ = feat.shape
            box = ConvBNSiLU(cb, 3, name=f"head_box{li}_0")(feat, train)
            box = ConvBNSiLU(cb, 3, name=f"head_box{li}_1")(box, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), name=f"head_box{li}_2")(box)
            cls = ConvBNSiLU(cc, 3, name=f"head_cls{li}_0")(feat, train)
            cls = ConvBNSiLU(cc, 3, name=f"head_cls{li}_1")(cls, train)
            cls = nn.Conv(self.num_classes, (1, 1), name=f"head_cls{li}_2")(cls)
            flat_box.append(box.reshape(b_, h * w, 4 * self.reg_max))
            flat_cls.append(cls.reshape(b_, h * w, self.num_classes))
            yy, xx = jnp.meshgrid(
                jnp.arange(h, dtype=jnp.float32) + 0.5,
                jnp.arange(w, dtype=jnp.float32) + 0.5,
                indexing="ij",
            )
            anchors.append(jnp.stack([xx.ravel(), yy.ravel()], axis=-1))
            stride_vec.append(jnp.full((h * w,), float(stride)))

        box_logits = jnp.concatenate(flat_box, axis=1)   # (B, N, 4*reg_max)
        cls_logits = jnp.concatenate(flat_cls, axis=1)   # (B, N, nc)
        anchor_pts = jnp.concatenate(anchors, axis=0)    # (N, 2) cell units
        stride_all = jnp.concatenate(stride_vec, axis=0)  # (N,)

        # DFL: expectation over the per-side distance distribution.
        b_, n_, _ = box_logits.shape
        dist = jax.nn.softmax(
            box_logits.reshape(b_, n_, 4, self.reg_max), axis=-1
        ) @ jnp.arange(self.reg_max, dtype=jnp.float32)  # (B, N, 4) ltrb

        # dist2bbox (xywh): centers from anchor +- (l, t, r, b) / 2.
        lt, rb = dist[..., :2], dist[..., 2:]
        x1y1 = anchor_pts[None] - lt
        x2y2 = anchor_pts[None] + rb
        cxy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        boxes = jnp.concatenate([cxy, wh], axis=-1) * stride_all[None, :, None]

        preds = jnp.concatenate(
            [boxes, jax.nn.sigmoid(cls_logits)], axis=-1
        ).transpose(0, 2, 1)  # (B, 4+nc, N) — the ultralytics eval layout
        return preds, taps


# ---------------------------------------------------------------------------
# ultralytics state_dict conversion
# ---------------------------------------------------------------------------


def _np_t(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_k(t) -> np.ndarray:
    return _np_t(t).transpose(2, 3, 1, 0)


def _conv_bn(sd, prefix: str) -> Tuple[Dict, Dict]:
    """ultralytics Conv block -> {conv, bn} params + bn stats."""
    params = {
        "conv": {"kernel": _conv_k(sd[f"{prefix}.conv.weight"])},
        "bn": {
            "scale": _np_t(sd[f"{prefix}.bn.weight"]),
            "bias": _np_t(sd[f"{prefix}.bn.bias"]),
        },
    }
    stats = {
        "bn": {
            "mean": _np_t(sd[f"{prefix}.bn.running_mean"]),
            "var": _np_t(sd[f"{prefix}.bn.running_var"]),
        }
    }
    return params, stats


def _c2f(sd, prefix: str, n: int) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    for name in ("cv1", "cv2"):
        params[name], stats[name] = _conv_bn(sd, f"{prefix}.{name}")
    for i in range(n):
        bp, bs = {}, {}
        for name in ("cv1", "cv2"):
            bp[name], bs[name] = _conv_bn(sd, f"{prefix}.m.{i}.{name}")
        params[f"m{i}"], stats[f"m{i}"] = bp, bs
    return params, stats


def convert_ultralytics_yolov8(
    state_dict, num_classes: int, scale: str = "n", reg_max: int = 16
) -> Tuple[YoloV8, Dict]:
    """(ultralytics detection ``state_dict``, nc, scale) -> (YoloV8, vars).

    Accepts the raw ``model.state_dict()`` of an ultralytics ``DetectionModel``
    (keys ``model.{i}.*``; a leading ``model.`` per entry is the module-list
    prefix). Forward parity vs eval-mode ultralytics layout is pinned by
    tests/test_yolov8_convert.py against an independently-built torch replica
    of the published architecture.
    """
    sd = dict(state_dict)
    cfg = yolov8_widths(scale)
    ns, nb = cfg["n_small"], cfg["n_big"]
    model = YoloV8(num_classes=num_classes, scale=scale, reg_max=reg_max)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    conv_layers = {0: None, 1: None, 3: None, 5: None, 7: None, 16: None,
                   19: None}
    c2f_layers = {2: ns, 4: nb, 6: nb, 8: ns, 12: ns, 15: ns, 18: ns, 21: ns}
    for i in conv_layers:
        params[f"layer{i}"], stats[f"layer{i}"] = _conv_bn(sd, f"model.{i}")
    for i, n in c2f_layers.items():
        params[f"layer{i}"], stats[f"layer{i}"] = _c2f(sd, f"model.{i}", n)
    # SPPF (layer 9)
    p9, s9 = {}, {}
    for name in ("cv1", "cv2"):
        p9[name], s9[name] = _conv_bn(sd, f"model.9.{name}")
    params["layer9"], stats["layer9"] = p9, s9

    # Detect head (layer 22): per level, box branch cv2 / cls branch cv3,
    # each two Conv blocks + a biased 1x1 conv.
    for li in range(3):
        for branch, ours in (("cv2", "head_box"), ("cv3", "head_cls")):
            for j in range(2):
                (params[f"{ours}{li}_{j}"],
                 stats[f"{ours}{li}_{j}"]) = _conv_bn(
                    sd, f"model.22.{branch}.{li}.{j}"
                )
            params[f"{ours}{li}_2"] = {
                "kernel": _conv_k(sd[f"model.22.{branch}.{li}.2.weight"]),
                "bias": _np_t(sd[f"model.22.{branch}.{li}.2.bias"]),
            }

    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }
    return model, variables


class YoloV8JaxAdapter:
    """``adapter(image, predict_conf) -> DetectionResult`` over a flax
    YOLOv8 — the torch-free counterpart of driving an ultralytics model
    through the reference's output scraping (abstract_classes.py:437-518).

    Per-detection selection is best-class confidence thresholding followed
    by class-offset NMS on xyxy boxes (ultralytics postprocess semantics);
    ``logits`` carries log class scores (what ``yolo_get_logits`` emits for
    the replay path), ``raw_prediction`` the full (1, 4+nc, N) head tensor,
    and ``fmaps`` the requested neck taps as NCHW arrays for ROI pooling.
    """

    def __init__(self, model: YoloV8, variables: Dict,
                 fmap_taps: Sequence[str] = ("backbone_p5",),
                 iou_threshold: float = 0.7, max_det: int = 300,
                 max_wh: int = 7680):
        import jax as _jax

        self.model = model
        self.variables = variables
        self.fmap_taps = tuple(fmap_taps)
        self.iou_threshold = float(iou_threshold)
        self.max_det = int(max_det)
        self.max_wh = int(max_wh)
        self._forward = _jax.jit(
            lambda imgs: model.apply(variables, imgs, train=False)
        )

    def __call__(self, image, predict_conf: float = 0.25, **kw):
        from runia_core_tpu.extraction.adapters import DetectionResult
        from runia_core_tpu.ops.nms import nms_indices

        x = np.asarray(image, np.float32)
        if x.ndim == 3:
            x = x[None]
        img_h, img_w = int(x.shape[1]), int(x.shape[2])
        preds, taps = self._forward(jnp.asarray(x))
        preds = np.asarray(preds)

        pred = preds[0].T  # (N, 4 + nc)
        cls = pred[:, 4:]
        conf = cls.max(1)
        classes = cls.argmax(1)
        sel = conf > predict_conf

        cx, cy, w, h = pred[sel, 0], pred[sel, 1], pred[sel, 2], pred[sel, 3]
        xyxy = np.stack(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
        ).astype(np.float32)
        if xyxy.shape[0]:
            offset = classes[sel][:, None].astype(np.float32) * self.max_wh
            keep = nms_indices(
                xyxy + offset, conf[sel], self.iou_threshold,
                max_det=self.max_det,
            )
        else:
            keep = np.zeros((0,), np.int64)

        fmaps = [
            np.transpose(np.asarray(taps[name]), (0, 3, 1, 2))
            for name in self.fmap_taps
        ]
        log_cls = np.log(np.clip(cls[sel][keep], 1e-12, None))
        return DetectionResult(
            boxes=xyxy[keep],
            img_shape=(img_h, img_w),
            scores=conf[sel][keep],
            classes=classes[sel][keep].astype(np.int64),
            logits=log_cls,
            features=None,
            fmaps=fmaps,
            raw_prediction=preds,
        )
