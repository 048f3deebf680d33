"""YOLOv8 checkpoint conversion parity.

ultralytics is not installed in this environment, so the reference model is
an independent torch implementation of the published YOLOv8 detection
architecture below, built with ultralytics' module/attribute layout so its
``state_dict()`` has the exact key structure real checkpoints carry
(``model.{i}.conv/bn``, ``model.{i}.cv1/cv2/m.{j}``, ``model.22.cv2/cv3/
dfl``). convert_ultralytics_yolov8 must reproduce its eval-mode prediction
tensor, and the converted model must drive the yolo_get_logits NMS replay.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn

from runia_core_tpu.models.yolov8 import (
    YoloV8,
    convert_ultralytics_yolov8,
    yolov8_widths,
)

NC = 5
IMG = 64
SCALE = "n"


class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TDFL(tnn.Module):
    def __init__(self, c1=16):
        super().__init__()
        self.conv = tnn.Conv2d(c1, 1, 1, bias=False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(
            1, c1, 1, 1
        )
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape
        return self.conv(
            x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)
        ).view(b, 4, a)


class TDetect(tnn.Module):
    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        self.nc, self.reg_max = nc, reg_max
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1))
            for c in ch
        )
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1))
            for c in ch
        )
        self.dfl = TDFL(reg_max)
        self.strides = (8, 16, 32)

    def forward(self, feats):
        outs, anchors, strides = [], [], []
        for i, x in enumerate(feats):
            outs.append(torch.cat([self.cv2[i](x), self.cv3[i](x)], 1))
            _, _, h, w = x.shape
            sy, sx = torch.meshgrid(
                torch.arange(h, dtype=torch.float) + 0.5,
                torch.arange(w, dtype=torch.float) + 0.5,
                indexing="ij",
            )
            anchors.append(torch.stack((sx, sy), -1).view(-1, 2))
            strides.append(
                torch.full((h * w,), float(self.strides[i]))
            )
        x_cat = torch.cat([o.view(o.shape[0], o.shape[1], -1) for o in outs], 2)
        box, cls = x_cat.split((4 * self.reg_max, self.nc), 1)
        anchor_pts = torch.cat(anchors).transpose(0, 1)  # (2, N)
        stride_all = torch.cat(strides)
        dist = self.dfl(box)
        lt, rb = dist.chunk(2, 1)
        x1y1 = anchor_pts.unsqueeze(0) - lt
        x2y2 = anchor_pts.unsqueeze(0) + rb
        dbox = torch.cat(((x1y1 + x2y2) / 2, x2y2 - x1y1), 1) * stride_all
        return torch.cat((dbox, cls.sigmoid()), 1)


class TYoloV8(tnn.Module):
    """ultralytics DetectionModel replica with the model.{i} ModuleList."""

    def __init__(self, nc, scale=SCALE):
        super().__init__()
        cfg = yolov8_widths(scale)
        c1, c2, c3, c4, c5 = (cfg[k] for k in ("c1", "c2", "c3", "c4", "c5"))
        ns, nb = cfg["n_small"], cfg["n_big"]
        self.model = tnn.ModuleList([
            TConv(3, c1, 3, 2),            # 0
            TConv(c1, c2, 3, 2),           # 1
            TC2f(c2, c2, ns, True),        # 2
            TConv(c2, c3, 3, 2),           # 3
            TC2f(c3, c3, nb, True),        # 4
            TConv(c3, c4, 3, 2),           # 5
            TC2f(c4, c4, nb, True),        # 6
            TConv(c4, c5, 3, 2),           # 7
            TC2f(c5, c5, ns, True),        # 8
            TSPPF(c5, c5, 5),              # 9
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 10
            tnn.Identity(),                # 11 (Concat)
            TC2f(c5 + c4, c4, ns, False),  # 12
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 13
            tnn.Identity(),                # 14 (Concat)
            TC2f(c4 + c3, c3, ns, False),  # 15
            TConv(c3, c3, 3, 2),           # 16
            tnn.Identity(),                # 17 (Concat)
            TC2f(c3 + c4, c4, ns, False),  # 18
            TConv(c4, c4, 3, 2),           # 19
            tnn.Identity(),                # 20 (Concat)
            TC2f(c4 + c5, c5, ns, False),  # 21
            TDetect(nc, (c3, c4, c5)),     # 22
        ])

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        n4 = m[12](torch.cat([m[10](p5), p4], 1))
        n3 = m[15](torch.cat([m[13](n4), p3], 1))
        h4 = m[18](torch.cat([m[16](n3), n4], 1))
        h5 = m[21](torch.cat([m[19](h4), p5], 1))
        return m[22]([n3, h4, h5])


@pytest.fixture(scope="module")
def torch_yolo():
    torch.manual_seed(0)
    net = TYoloV8(NC).eval()
    # Randomize BN running stats so eval-mode normalization is non-trivial.
    rng = np.random.RandomState(1)
    for mod in net.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            n = mod.running_mean.shape[0]
            mod.running_mean.data = torch.from_numpy(
                rng.randn(n).astype(np.float32) * 0.1
            )
            mod.running_var.data = torch.from_numpy(
                (rng.rand(n).astype(np.float32) * 0.8 + 0.6)
            )
    return net


class TestConvertUltralyticsYolov8:
    def test_state_dict_keys_are_ultralytics_layout(self, torch_yolo):
        keys = set(torch_yolo.state_dict().keys())
        for expect in (
            "model.0.conv.weight", "model.0.bn.running_mean",
            "model.2.cv1.conv.weight", "model.2.m.0.cv1.conv.weight",
            "model.9.cv2.conv.weight", "model.22.cv2.0.2.weight",
            "model.22.cv3.2.1.bn.running_var", "model.22.dfl.conv.weight",
        ):
            assert expect in keys, expect

    def test_predictions_match_torch_eval(self, torch_yolo):
        model, variables = convert_ultralytics_yolov8(
            torch_yolo.state_dict(), num_classes=NC, scale=SCALE
        )
        x = np.random.RandomState(0).rand(2, IMG, IMG, 3).astype(np.float32)
        with torch.no_grad():
            ref = torch_yolo(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        preds, taps = model.apply(variables, jnp.asarray(x))
        preds = np.asarray(preds)
        assert preds.shape == ref.shape  # (2, 4+NC, 8^2+4^2+2^2 cells)
        np.testing.assert_allclose(preds, ref, rtol=1e-3, atol=1e-4)
        assert taps["p3"].shape[1] == IMG // 8
        assert taps["backbone_p5"].shape[1] == IMG // 32

    def test_nms_replay_on_converted_model(self, torch_yolo):
        """The converted model's raw predictions drive the reference-style
        NMS replay (yolo_get_logits) end to end."""
        from runia_core_tpu.extraction.adapters import yolo_get_logits

        model, variables = convert_ultralytics_yolov8(
            torch_yolo.state_dict(), num_classes=NC, scale=SCALE
        )
        x = np.random.RandomState(2).rand(1, IMG, IMG, 3).astype(np.float32)
        preds, _ = model.apply(variables, jnp.asarray(x))
        out = yolo_get_logits(
            np.asarray(preds), conf_thres=0.01, iou_thres=0.7, nc=NC
        )
        assert out.ndim == 2 and out.shape[1] == NC
        assert np.isfinite(out).all()

    def test_jax_adapter_drives_object_stack(self, torch_yolo):
        """Converted model -> DetectionResult -> ROI features + MD scoring,
        no torch in the loop."""
        from runia_core_tpu.detectors import MDLatentSpace
        from runia_core_tpu.extraction.object_level import BoxFeaturesExtractor
        from runia_core_tpu.models import YoloV8JaxAdapter

        model, variables = convert_ultralytics_yolov8(
            torch_yolo.state_dict(), num_classes=NC, scale=SCALE
        )
        adapter = YoloV8JaxAdapter(model, variables)
        rng = np.random.RandomState(3)
        det = adapter(rng.rand(IMG, IMG, 3).astype(np.float32),
                      predict_conf=0.0)
        n = det.boxes.shape[0]
        assert n > 0
        assert det.logits.shape == (n, NC)
        assert det.raw_prediction.shape[1] == 4 + NC
        # NCHW layout: p5 spatial is IMG/32, channels sit in dim 1 (an NHWC
        # regression would leave channels trailing and fail the spatial dims).
        p5 = IMG // 32
        assert det.fmaps[0].shape[0] == 1 and det.fmaps[0].shape[2:] == (p5, p5)
        assert det.fmaps[0].shape[1] > p5

        ex = BoxFeaturesExtractor(
            model=adapter, architecture="yolov8", roi_output_sizes=[2],
        )
        data = [(f"im{i}", rng.rand(IMG, IMG, 3).astype(np.float32), i)
                for i in range(2)]
        out = ex.get_ls_samples(data, predict_conf=0.0)
        feats = np.concatenate([out[i]["latent_space_means"] for i in range(2)])
        assert np.isfinite(feats).all() and feats.shape[0] > 0

        md = MDLatentSpace()
        md.setup(feats)
        assert np.isfinite(
            np.asarray(md.postprocess(out[0]["latent_space_means"]))
        ).all()
