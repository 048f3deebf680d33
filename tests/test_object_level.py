"""Object-level extraction + inference tests with mock detection adapters.

Mirrors the reference's mock-based architecture test strategy
(tests/unit_test_extraction_abstract.py, unit_test_object_level_*.py):
hand-rolled adapters emulate each architecture's output contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.extraction import (
    BoxFeaturesExtractor,
    DetectionResult,
    get_aggregated_data_dict,
    associate_precalculated_baselines_with_raw_predictions,
    postprocess_architecture_taps,
    yolo_get_logits,
)
from runia_core_tpu.extraction.object_level import (
    _dropblock_rois_get_entropy,
    _reduce_features_to_rois,
)
from runia_core_tpu.inference import BoxInferenceYolo, ObjectLevelInference
from runia_core_tpu.sampling import MCSamplerModule

IMG_H, IMG_W = 64, 96


class MockDetector:
    """Adapter emulating a generic detector: boxes + logits + fmaps."""

    def __init__(self, rng, n_boxes=3, channels=(16,), fmap=8):
        self.rng = rng
        self.n_boxes = n_boxes
        self.channels = channels
        self.fmap = fmap

    def __call__(self, image, predict_conf, **kwargs):
        n = self.n_boxes
        if n > 0:
            xy = self.rng.rand(n, 2) * np.array([IMG_W / 2, IMG_H / 2])
            wh = self.rng.rand(n, 2) * 20 + 5
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        else:
            boxes = np.zeros((0, 4), np.float32)
        return DetectionResult(
            boxes=boxes,
            img_shape=(IMG_H, IMG_W),
            scores=self.rng.rand(n).astype(np.float32),
            classes=self.rng.randint(0, 4, n),
            logits=self.rng.randn(n, 4).astype(np.float32),
            fmaps=[
                self.rng.rand(1, c, self.fmap, int(self.fmap * IMG_W / IMG_H)).astype(
                    np.float32
                )
                for c in self.channels
            ],
            extra={"names": {0: "a", 1: "b", 2: "c", 3: "d"}},
        )


class TestReduceFeaturesToRois:
    def test_shapes_and_values(self, rng):
        fmaps = [jnp.asarray(rng.rand(1, 8, 10, 15).astype(np.float32)),
                 jnp.asarray(rng.rand(1, 4, 5, 8).astype(np.float32))]
        boxes = jnp.asarray(np.array([[5, 5, 40, 30], [0, 0, 96, 64]], np.float32))
        means, stds = _reduce_features_to_rois(
            fmaps, [7, 3], boxes, (IMG_H, IMG_W), -1, 2, 2, return_stds=True
        )
        assert means.shape == (2, 12)
        assert stds.shape == (2, 12)
        # Whole-image box channel means approximate the fmap channel means
        from runia_core_tpu.ops.roi_align import roi_align

        rois0 = roi_align(fmaps[0], boxes, 7, 15 / IMG_W, -1, True)
        np.testing.assert_allclose(
            np.asarray(means)[1, :8],
            np.asarray(jnp.mean(rois0, axis=(2, 3)))[1],
            rtol=1e-5,
        )

    def test_dropblock_rois_entropy(self, rng):
        fmaps = [jnp.asarray(rng.rand(1, 8, 12, 12).astype(np.float32))]
        boxes = jnp.asarray(np.array([[5, 5, 40, 30], [10, 10, 80, 60]], np.float32))
        sampler = MCSamplerModule(mc_samples=8, block_size=3, drop_prob=0.5)
        ent = _dropblock_rois_get_entropy(
            fmaps, [7], boxes, (IMG_H, IMG_W), -1, 1, 8, sampler, key=jax.random.key(0)
        )
        assert ent.shape == (2, 8)
        assert np.isfinite(ent).all()


class TestBoxFeaturesExtractor:
    def test_get_ls_samples_layout(self, rng):
        model = MockDetector(rng, n_boxes=3, channels=(16, 8))
        extractor = BoxFeaturesExtractor(
            model=model,
            architecture="yolov8",
            roi_output_sizes=[7, 5],
        )
        loader = [([f"img{i}.jpg"], None, i) for i in range(4)]
        results = extractor.get_ls_samples(loader, predict_conf=0.25)
        assert set(results.keys()) == {0, 1, 2, 3, "no_obj"}
        assert results[0]["latent_space_means"].shape == (3, 24)
        assert results[0]["logits"].shape == (3, 4)
        assert results[0]["boxes"].shape == (3, 4)
        assert results["no_obj"] == []

    def test_no_detection_fallback(self, rng):
        model = MockDetector(rng, n_boxes=0)
        extractor = BoxFeaturesExtractor(
            model=model, architecture="yolov8", roi_output_sizes=[7]
        )
        results, found = extractor._get_samples_one_image(None, 0.25)
        assert not found
        np.testing.assert_array_equal(
            results["boxes"], [[0.0, 0.0, IMG_W, IMG_H]]
        )
        assert results["latent_space_means"].shape == (1, 16)

    def test_rcnn_pyramid_replication(self, rng):
        class RCNNMock:
            def __call__(self, image, predict_conf, **kw):
                return DetectionResult(
                    boxes=np.array([[5, 5, 30, 30]], np.float32),
                    img_shape=(IMG_H, IMG_W),
                    fmaps=[rng.rand(1, 4, s, s).astype(np.float32)
                           for s in (32, 16, 8, 4, 2)],
                )

        extractor = BoxFeaturesExtractor(
            model=RCNNMock(), architecture="rcnn", roi_output_sizes=[7],
            rcnn_extraction_type="backbone",
        )
        assert extractor.n_hooked_reps == 5
        results, found = extractor._get_samples_one_image(None, 0.25)
        assert results["latent_space_means"].shape == (1, 20)  # 5 levels x 4 ch

    def test_entropy_path(self, rng):
        model = MockDetector(rng, n_boxes=2, channels=(8,))
        extractor = BoxFeaturesExtractor(
            model=model, architecture="yolov8", roi_output_sizes=[7],
            extract_noise_entropies=True, mcd_nro_samples=8,
            dropblock_probs=0.5, dropblock_sizes=3,
        )
        results, found = extractor._get_samples_one_image(None, 0.25)
        assert results["latent_space_means"].shape == (2, 8)


class TestArchitectureTaps:
    def test_owlv2_reshape(self, rng):
        tokens = rng.rand(1, 1 + 16, 32).astype(np.float32)  # 4x4 grid, CLS first
        out = postprocess_architecture_taps("owlv2", [(tokens,)])
        assert out[0].shape == (1, 32, 4, 4)
        # token k of the grid lands at (k//4, k%4)
        np.testing.assert_allclose(
            np.asarray(out[0])[0, :, 0, 1], tokens[0, 2], rtol=1e-6
        )

    def test_rtdetr_encoder_permute(self, rng):
        seq = rng.rand(1, 400, 256).astype(np.float32)
        out = postprocess_architecture_taps("rtdetr-encoder", [(seq,)])
        assert out[0].shape == (1, 256, 20, 20)

    def test_dino_selection(self, rng):
        lvl = rng.rand(1, 8, 6, 6).astype(np.float32)
        latent = [(None, (None, None, lvl))]
        out = postprocess_architecture_taps("dino", latent)
        assert out[0].shape == (1, 8, 6, 6)

    def test_rcnn_rpn_head_concat(self, rng):
        obj = [rng.rand(1, 3, 8, 8).astype(np.float32)]
        deltas = [rng.rand(1, 12, 8, 8).astype(np.float32)]
        out = postprocess_architecture_taps(
            "rcnn", [ (obj, deltas) ], rcnn_extraction_type="rpn_head"
        )
        assert out[0].shape == (1, 15, 8, 8)


class TestYoloGetLogits:
    def make_raw(self, rng, n_anchors=50, nc=4):
        raw = rng.rand(1, 4 + nc, n_anchors).astype(np.float32)
        # boxes as xyxy-ish plausible values
        raw[:, 0:2] *= 10
        raw[:, 2:4] = raw[:, 0:2] + 20 * rng.rand(1, 2, n_anchors)
        raw[:, 4:] *= 0.9
        return raw

    def test_survivor_count_and_log(self, rng):
        raw = self.make_raw(rng)
        out = yolo_get_logits(raw, conf_thres=0.25, iou_thres=0.5)
        assert out.ndim == 2 and out.shape[1] == 4
        assert (out <= 0).all()  # log of probabilities in (0, 0.9]
        assert out.shape[0] > 0

    def test_no_candidates(self, rng):
        raw = self.make_raw(rng)
        out = yolo_get_logits(raw, conf_thres=0.99, iou_thres=0.5)
        assert out.shape[0] == 0

    def test_max_det(self, rng):
        raw = self.make_raw(rng, n_anchors=200)
        out = yolo_get_logits(raw, conf_thres=0.1, iou_thres=0.99, max_det=5)
        assert out.shape[0] <= 5

    def test_classes_filter_keeps_logits_aligned(self):
        """Regression: the classes filter / max_nms truncation must reorder
        the class-score rows together with the detections — misalignment
        silently corrupts every downstream OoD score."""
        # 4 well-separated anchors; argmax classes [2, 0, 1, 0]
        nc, n = 3, 4
        raw = np.zeros((1, 4 + nc, n), np.float32)
        for a, (x0, cls, conf) in enumerate(
            [(0, 2, 0.9), (100, 0, 0.8), (200, 1, 0.7), (300, 0, 0.6)]
        ):
            raw[0, 0, a], raw[0, 1, a] = x0, 0
            raw[0, 2, a], raw[0, 3, a] = x0 + 10, 10
            raw[0, 4 + cls, a] = conf
        out = yolo_get_logits(raw, conf_thres=0.25, iou_thres=0.5, classes=[0])
        # only the two class-0 anchors survive; their max scores are 0.8, 0.6
        assert out.shape == (2, nc)
        np.testing.assert_allclose(
            np.exp(out).max(axis=1), [0.8, 0.6], atol=1e-6
        )

    def test_max_nms_truncation_keeps_logits_aligned(self):
        nc, n = 2, 6
        raw = np.zeros((1, 4 + nc, n), np.float32)
        confs = [0.3, 0.9, 0.5, 0.8, 0.4, 0.7]
        for a, conf in enumerate(confs):
            raw[0, 0, a], raw[0, 1, a] = 100 * a, 0
            raw[0, 2, a], raw[0, 3, a] = 100 * a + 10, 10
            raw[0, 4, a] = conf
        out = yolo_get_logits(raw, conf_thres=0.25, iou_thres=0.5, max_nms=3)
        # top-3 by confidence, in truncation order
        np.testing.assert_allclose(
            np.exp(out).max(axis=1), [0.9, 0.8, 0.7], atol=1e-6
        )


class TestObjectLevelInference:
    def test_generic_inference(self, rng):
        model = MockDetector(rng, n_boxes=3, channels=(16,))
        # Fit LaREM on extracted train features
        extractor = BoxFeaturesExtractor(
            model=model, architecture="yolov8", roi_output_sizes=[7]
        )
        loader = [([f"t{i}"], None, i) for i in range(10)]
        data = {"train": extractor.get_ls_samples(loader)}
        agg, no_obj, non_empty = get_aggregated_data_dict(
            data, "train", {}, {}, {}, probs_as_logits=False
        )
        larem = MDLatentSpace()
        larem.setup(agg["train latent_space_means"])

        inference = ObjectLevelInference(
            model=model,
            postprocessor=larem,
            architecture="yolov8",
            latent_space_method=True,
            postprocessor_input=["latent_space_means"],
            roi_output_sizes=[7],
        )
        raw, scores = inference.get_score(None, predict_conf=0.25)
        assert isinstance(raw, DetectionResult)
        assert scores.shape == (3,)

    def test_yolo_ood_rewrite(self, rng):
        model = MockDetector(rng, n_boxes=4, channels=(16,))
        train = rng.rand(100, 16).astype(np.float32)
        yolo_inf = BoxInferenceYolo(
            model=model,
            postprocessor=None,
            postprocessor_type="MD",
            ind_samples=train,
            roi_output_sizes=[7],
        )
        # Threshold +inf: everything is OoD -> all classes rewritten
        out = yolo_inf.get_score(None, confidence_score=0.25, threshold=np.inf)
        assert (out.classes == out.extra["ood_class_id"]).all()
        assert out.extra["ood_scores"].shape == (4,)
        # Threshold -inf: nothing rewritten
        out2 = yolo_inf.get_score(None, confidence_score=0.25, threshold=-np.inf)
        assert not (out2.classes == out2.extra["ood_class_id"]).any()


class TestAggregation:
    def test_aggregate_and_associate(self, rng):
        model = MockDetector(rng, n_boxes=2, channels=(8,))
        extractor = BoxFeaturesExtractor(
            model=model, architecture="yolov8", roi_output_sizes=[5]
        )
        loader = [([f"t{i}"], None, i) for i in range(3)]
        data = {"val": extractor.get_ls_samples(loader)}
        agg, no_obj, non_empty = get_aggregated_data_dict(
            data, "val", {}, {}, {}, probs_as_logits=False
        )
        assert agg["val latent_space_means"].shape == (6, 8)
        assert agg["val logits"].shape == (6, 4)
        assert non_empty["val"] == [0, 0, 1, 1, 2, 2]

        scores = {"msp": np.arange(6, dtype=np.float32)}
        data_out = associate_precalculated_baselines_with_raw_predictions(
            data["val"], "val", scores, ["msp"], non_empty["val"], is_ood=False
        )
        assert data_out[0]["msp"] == [0.0, 1.0]
        assert data_out[2]["msp"] == [4.0, 5.0]
