"""End-to-end object-level OoD with the built-in flax detector (no mocks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.extraction import (
    BoxFeaturesExtractor,
    get_aggregated_data_dict,
    yolo_get_logits,
)
from runia_core_tpu.inference import ObjectLevelInference
from runia_core_tpu.models import JaxDetectorAdapter, SimpleDetector

IMG = 64


@pytest.fixture(scope="module")
def adapter():
    model = SimpleDetector(num_classes=4, features=8, stride=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    return JaxDetectorAdapter(model, variables)


class TestSimpleDetector:
    def test_raw_head_shape(self, adapter, rng):
        img = rng.rand(IMG, IMG, 3).astype(np.float32)
        det = adapter(img, predict_conf=0.0)
        cells = (IMG // 8) ** 2
        assert det.raw_prediction.shape == (1, 8, cells)
        assert det.fmaps[0].shape[2:] == (IMG // 8, IMG // 8)

    def test_detection_protocol(self, adapter, rng):
        img = rng.rand(IMG, IMG, 3).astype(np.float32)
        det = adapter(img, predict_conf=0.1)
        n = det.boxes.shape[0]
        assert det.scores.shape == (n,)
        assert det.logits.shape == (n, 4)
        assert (det.scores > 0.1).all()

    def test_raw_head_feeds_yolo_get_logits(self, adapter, rng):
        img = rng.rand(IMG, IMG, 3).astype(np.float32)
        det = adapter(img, predict_conf=0.1)
        logits = yolo_get_logits(det.raw_prediction, conf_thres=0.1, iou_thres=0.5)
        assert logits.ndim == 2 and logits.shape[1] == 4
        assert (logits <= 0).all()  # log of probabilities

    def test_end_to_end_object_ood(self, adapter, rng):
        """Real detector -> ROI features -> LaREM per-detection scoring."""
        extractor = BoxFeaturesExtractor(
            model=adapter, architecture="yolov8", roi_output_sizes=[5]
        )
        loader = [
            (f"img{i}", rng.rand(IMG, IMG, 3).astype(np.float32), i)
            for i in range(6)
        ]
        data = {"train": extractor.get_ls_samples(loader, predict_conf=0.05)}
        agg, _, _ = get_aggregated_data_dict(data, "train", {}, {}, {}, False)
        assert agg["train latent_space_means"].ndim == 2

        larem = MDLatentSpace()
        larem.setup(agg["train latent_space_means"])
        inference = ObjectLevelInference(
            model=adapter,
            postprocessor=larem,
            architecture="yolov8",
            latent_space_method=True,
            postprocessor_input=["latent_space_means"],
            roi_output_sizes=[5],
        )
        raw, scores = inference.get_score(
            rng.rand(IMG, IMG, 3).astype(np.float32), predict_conf=0.05
        )
        if len(scores) > 0:
            assert np.isfinite(scores).all()
