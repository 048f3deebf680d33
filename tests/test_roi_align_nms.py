"""ROIAlign and NMS parity tests.

torchvision is not installed in this environment, so ROIAlign is validated
against a direct numpy transcription of the documented torchvision algorithm
(continuous coords, aligned offset, adaptive grid, bilinear with the
[-1, size] zero rule and edge clamping) and NMS against a numpy greedy
reference.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from runia_core_tpu.ops.nms import batched_class_nms_mask, nms_indices, pairwise_iou
from runia_core_tpu.ops.roi_align import roi_align


def bilinear(fmap, y, x):
    """torchvision bilinear_interpolate for one channel plane."""
    h, w = fmap.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(np.floor(y)), int(np.floor(x))
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (
        hy * hx * fmap[y_low, x_low]
        + hy * lx * fmap[y_low, x_high]
        + ly * hx * fmap[y_high, x_low]
        + ly * lx * fmap[y_high, x_high]
    )


def np_roi_align(fmap, boxes, out_size, scale, sampling_ratio=-1, aligned=True):
    """Numpy transcription of the torchvision ROIAlign algorithm."""
    c, h, w = fmap.shape
    n = boxes.shape[0]
    out = np.zeros((n, c, out_size, out_size), np.float64)
    offset = 0.5 if aligned else 0.0
    for ni in range(n):
        x1 = boxes[ni, 0] * scale - offset
        y1 = boxes[ni, 1] * scale - offset
        x2 = boxes[ni, 2] * scale - offset
        y2 = boxes[ni, 3] * scale - offset
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out_size, rh / out_size
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / out_size))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / out_size))
        count = max(gh * gw, 1)
        for ci in range(c):
            for ph in range(out_size):
                for pw in range(out_size):
                    acc = 0.0
                    for iy in range(gh):
                        yy = y1 + ph * bh + bh * (iy + 0.5) / gh
                        for ix in range(gw):
                            xx = x1 + pw * bw + bw * (ix + 0.5) / gw
                            acc += bilinear(fmap[ci], yy, xx)
                    out[ni, ci, ph, pw] = acc / count
    return out


def np_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        for jdx in order:
            if suppressed[jdx] or jdx == idx:
                continue
            iou = np.asarray(
                pairwise_iou(jnp.asarray(boxes[idx][None]), jnp.asarray(boxes[jdx][None]))
            )[0, 0]
            if iou > thr:
                suppressed[jdx] = True
    return np.array(keep)


class TestROIAlign:
    def test_matches_reference_algorithm(self, rng):
        fmap = rng.rand(3, 10, 12).astype(np.float32)
        img_h, img_w = 80, 96  # scale = 12/96 = 0.125
        scale = fmap.shape[2] / img_w
        boxes = np.array(
            [
                [8.0, 8.0, 40.0, 48.0],
                [0.0, 0.0, 96.0, 80.0],  # whole image
                [30.5, 20.25, 70.75, 60.5],
                [5.0, 5.0, 12.0, 11.0],  # small box
            ],
            np.float32,
        )
        ours = np.asarray(
            roi_align(jnp.asarray(fmap), jnp.asarray(boxes), 7, scale, -1, True)
        )
        expected = np_roi_align(fmap, boxes, 7, scale)
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)

    def test_bf16_features_track_f32_positions(self, rng):
        # Production fmaps are bf16, but positions/weights must be built in
        # f32: a 256px coordinate quantized to bf16 moves by up to ~1px,
        # which shifts the bilinear sample off the reference grid entirely.
        # The bf16 path may only differ from f32 by matmul rounding (~1e-2).
        fmap = rng.rand(8, 16, 16).astype(np.float32)
        boxes = np.array(
            [[200.3, 100.7, 231.9, 140.2], [13.6, 7.1, 57.8, 44.4]],
            np.float32,
        )
        ref = np.asarray(
            roi_align(jnp.asarray(fmap), jnp.asarray(boxes), 7, 16 / 256, -1, True)
        )
        got = np.asarray(
            roi_align(
                jnp.asarray(fmap, jnp.bfloat16), jnp.asarray(boxes), 7,
                16 / 256, -1, True,
            ).astype(jnp.float32)
        )
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)

    def test_fixed_sampling_ratio(self, rng):
        fmap = rng.rand(2, 8, 8).astype(np.float32)
        boxes = np.array([[1.0, 1.0, 6.0, 7.0]], np.float32)
        ours = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(boxes), 3, 1.0, 2, True))
        expected = np_roi_align(fmap, boxes, 3, 1.0, sampling_ratio=2)
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)

    def test_unaligned(self, rng):
        fmap = rng.rand(2, 8, 8).astype(np.float32)
        boxes = np.array([[1.0, 2.0, 5.0, 6.0]], np.float32)
        ours = np.asarray(
            roi_align(jnp.asarray(fmap), jnp.asarray(boxes), 4, 1.0, -1, False)
        )
        expected = np_roi_align(fmap, boxes, 4, 1.0, aligned=False)
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)

    def test_batch1_input(self, rng):
        fmap = rng.rand(1, 2, 8, 8).astype(np.float32)
        boxes = np.array([[1.0, 1.0, 6.0, 6.0]], np.float32)
        out = roi_align(jnp.asarray(fmap), jnp.asarray(boxes), 2, 1.0)
        assert out.shape == (1, 2, 2, 2)

    def test_degenerate_box_zero(self, rng):
        fmap = rng.rand(1, 8, 8).astype(np.float32) + 1.0
        boxes = np.array([[3.0, 3.0, 3.0, 3.0]], np.float32)  # zero-area
        out = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(boxes), 2, 1.0))
        np.testing.assert_array_equal(out, 0.0)

    def test_reference_spatial_scale_formula(self, rng):
        """The extractor computes scale = fmap_W / img_W
        (reference object_level.py:288)."""
        fmap = rng.rand(4, 16, 16).astype(np.float32)
        boxes = np.array([[10.0, 12.0, 100.0, 110.0]], np.float32)
        scale = 16 / 128
        ours = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(boxes), 5, scale))
        expected = np_roi_align(fmap, boxes, 5, scale)
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


class TestNMS:
    def make_boxes(self, rng, n=40):
        xy = rng.rand(n, 2) * 50
        wh = rng.rand(n, 2) * 30 + 2
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        return boxes, scores

    def test_matches_numpy_greedy(self, rng):
        boxes, scores = self.make_boxes(rng)
        ours = nms_indices(boxes, scores, 0.5)
        expected = np_nms(boxes, scores, 0.5)
        np.testing.assert_array_equal(ours, expected)

    def test_thresholds(self, rng):
        boxes, scores = self.make_boxes(rng, 30)
        for thr in (0.1, 0.3, 0.9):
            np.testing.assert_array_equal(
                nms_indices(boxes, scores, thr), np_nms(boxes, scores, thr)
            )

    def test_empty(self):
        out = nms_indices(np.zeros((0, 4), np.float32), np.zeros(0, np.float32), 0.5)
        assert out.shape == (0,)

    def test_single_box(self):
        out = nms_indices(
            np.array([[0, 0, 5, 5]], np.float32), np.array([0.7], np.float32), 0.5
        )
        np.testing.assert_array_equal(out, [0])

    def test_all_identical_boxes(self):
        """Deepest possible suppression: every box overlaps every other; only
        the top-scoring one survives (fixed-point worst case)."""
        n = 64
        boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (n, 1))
        scores = np.linspace(0.1, 0.9, n).astype(np.float32)
        out = nms_indices(boxes, scores, 0.5)
        np.testing.assert_array_equal(out, [n - 1])  # highest score

    def test_alternating_chain(self):
        """A suppression chain where kills revive later boxes: boxes overlap
        only their immediate neighbor, scores descend — greedy keeps every
        other box."""
        n = 32
        boxes = np.stack(
            [np.arange(n) * 6.0, np.zeros(n), np.arange(n) * 6.0 + 10, np.full(n, 10.0)],
            axis=1,
        ).astype(np.float32)  # stride 6, width 10 -> IoU(i, i+1) = 4/16 = 0.25
        scores = np.linspace(0.9, 0.1, n).astype(np.float32)
        ours = nms_indices(boxes, scores, 0.2)
        expected = np_nms(boxes, scores, 0.2)
        np.testing.assert_array_equal(ours, expected)
        np.testing.assert_array_equal(ours, np.arange(0, n, 2))

    def test_max_det(self, rng):
        boxes, scores = self.make_boxes(rng)
        out = nms_indices(boxes, scores, 0.99, max_det=3)
        assert len(out) == 3

    def test_class_offset_separates_classes(self):
        # Two identical boxes in different classes: both survive class-aware NMS.
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        classes = np.array([0, 1])
        order, keep = batched_class_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.5
        )
        assert np.asarray(keep).all()
        # Same class: the lower-scoring one is suppressed.
        order, keep = batched_class_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(np.array([0, 0])), 0.5
        )
        assert np.asarray(keep).sum() == 1
