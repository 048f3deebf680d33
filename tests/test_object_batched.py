"""Batched padded object-level path: parity with the per-image path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.extraction.object_level import _reduce_features_to_rois
from runia_core_tpu.extraction.object_level_batched import (
    PaddedDetections,
    batched_roi_features,
    build_object_scorer,
    pad_detections,
)

IMG_H, IMG_W = 64, 96
MAX_DET = 6


def make_dets(rng, n):
    if n == 0:
        return {"boxes": np.zeros((0, 4), np.float32)}
    xy = rng.rand(n, 2) * np.array([IMG_W / 2, IMG_H / 2])
    wh = rng.rand(n, 2) * 20 + 5
    return {
        "boxes": np.concatenate([xy, xy + wh], 1).astype(np.float32),
        "scores": rng.rand(n).astype(np.float32),
        "classes": rng.randint(0, 4, n),
        "logits": rng.randn(n, 4).astype(np.float32),
    }


class TestPadDetections:
    def test_padding_and_masks(self, rng):
        dets = [make_dets(rng, 3), make_dets(rng, 0), make_dets(rng, 8)]
        padded = pad_detections(dets, MAX_DET, (IMG_H, IMG_W))
        assert padded.boxes.shape == (3, MAX_DET, 4)
        assert np.asarray(padded.valid).sum(axis=1).tolist() == [3, 1, MAX_DET]
        # Whole-image fallback for the empty image
        np.testing.assert_array_equal(
            np.asarray(padded.boxes)[1, 0], [0, 0, IMG_W, IMG_H]
        )
        # Overflow truncated by score
        kept_scores = np.asarray(padded.scores)[2]
        assert (np.diff(kept_scores) <= 1e-6).all() or kept_scores.min() >= np.sort(
            dets[2]["scores"]
        )[-MAX_DET]

    def test_logits_padded(self, rng):
        dets = [make_dets(rng, 2), make_dets(rng, 4)]
        padded = pad_detections(dets, MAX_DET, (IMG_H, IMG_W))
        assert padded.logits.shape == (2, MAX_DET, 4)
        np.testing.assert_allclose(
            np.asarray(padded.logits)[0, :2], dets[0]["logits"], rtol=1e-6
        )


class TestBatchedROIFeatures:
    def test_matches_per_image_path(self, rng):
        fmaps = [rng.rand(3, 8, 10, 15).astype(np.float32)]
        dets = [make_dets(rng, 3), make_dets(rng, 2), make_dets(rng, 0)]
        padded = pad_detections(dets, MAX_DET, (IMG_H, IMG_W))
        feats = batched_roi_features(
            (jnp.asarray(fmaps[0]),), padded.boxes, (IMG_H, IMG_W), (7,)
        )
        assert feats.shape == (3, MAX_DET, 8)
        # Compare each image against the per-image reference path
        for i, det in enumerate(dets):
            boxes = det["boxes"]
            if boxes.shape[0] == 0:
                boxes = np.array([[0, 0, IMG_W, IMG_H]], np.float32)
            means, _ = _reduce_features_to_rois(
                [jnp.asarray(fmaps[0][i : i + 1])],
                [7],
                jnp.asarray(boxes),
                (IMG_H, IMG_W),
                -1,
                1,
                boxes.shape[0],
            )
            np.testing.assert_allclose(
                np.asarray(feats)[i, : boxes.shape[0]],
                np.asarray(means),
                rtol=1e-4,
                atol=1e-5,
            )


class TestObjectScorer:
    def test_fused_scorer(self, rng):
        from runia_core_tpu.models import SimpleConvNet, build_tapped_forward

        model = SimpleConvNet(num_classes=4, features=8)
        images = rng.rand(3, IMG_H, IMG_W, 3).astype(np.float32)
        variables = model.init(jax.random.key(0), jnp.asarray(images[:1]))
        forward = build_tapped_forward(model, variables)

        md = MDLatentSpace()
        md.setup(rng.randn(100, 16).astype(np.float32))

        dets = [make_dets(rng, 3), make_dets(rng, 0), make_dets(rng, 5)]
        padded = pad_detections(dets, MAX_DET, (IMG_H, IMG_W))
        scorer = build_object_scorer(
            forward, md.state, output_sizes=(7,), img_shape=(IMG_H, IMG_W)
        )
        scores = scorer(jnp.asarray(images), padded)
        scores = np.asarray(scores)
        assert scores.shape == (3, MAX_DET)
        assert np.isfinite(scores[0, :3]).all()
        assert (scores[0, 3:] == -np.inf).all()  # padded rows masked
        assert np.isfinite(scores[1, 0])  # whole-image fallback scored
        assert (scores[1, 1:] == -np.inf).all()
