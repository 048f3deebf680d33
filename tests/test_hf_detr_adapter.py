"""Real HF detector through the object-level extraction stack.

The reference's extractors consume actual framework model outputs
(reference abstract_classes.py:410-518). This drives a genuine
``transformers.DetrForObjectDetection`` (random-init, offline) through
HFDetrAdapter into both whole-image (ImageLvlFeatureExtractor) and
per-detection (BoxFeaturesExtractor) extraction, plus detector scoring —
the full object-level flow on real HF detection outputs.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.extraction import (
    BoxFeaturesExtractor,
    HFDetrAdapter,
    ImageLvlFeatureExtractor,
    cxcywh_to_xyxy,
)

IMG = 64
D_MODEL = 32
C_BACKBONE = 128
N_QUERIES = 10
N_LABELS = 5


@pytest.fixture(scope="module")
def detr_adapter():
    cfg = transformers.DetrConfig(
        use_timm_backbone=False,
        use_pretrained_backbone=False,
        backbone_config=transformers.ResNetConfig(
            embedding_size=16, hidden_sizes=[16, 32, 64, C_BACKBONE],
            depths=[1, 1, 1, 1],
        ),
        d_model=D_MODEL,
        encoder_layers=1,
        decoder_layers=1,
        encoder_attention_heads=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        num_queries=N_QUERIES,
        num_labels=N_LABELS,
    )
    torch.manual_seed(0)
    return HFDetrAdapter(transformers.DetrForObjectDetection(cfg))


class TestHFDetrAdapter:
    def test_detection_result_schema(self, detr_adapter, rng):
        det = detr_adapter(rng.rand(IMG, IMG, 3).astype(np.float32),
                           predict_conf=0.0)
        n = det.boxes.shape[0]
        assert n == N_QUERIES  # conf 0 keeps every query
        assert det.logits.shape == (n, N_LABELS)
        assert det.features.shape == (n, D_MODEL)
        assert det.scores.shape == (n,)
        assert det.fmaps[0].shape == (1, C_BACKBONE, IMG // 32, IMG // 32)
        assert det.img_shape == (IMG, IMG)

    def test_threshold_filters(self, detr_adapter, rng):
        image = rng.rand(IMG, IMG, 3).astype(np.float32)
        all_det = detr_adapter(image, predict_conf=0.0)
        cut = float(np.median(all_det.scores))
        some_det = detr_adapter(image, predict_conf=cut)
        assert 0 < some_det.boxes.shape[0] < N_QUERIES
        assert (some_det.scores > cut).all()

    def test_cxcywh_conversion(self):
        boxes = np.array([[0.5, 0.5, 0.5, 0.25]])
        out = cxcywh_to_xyxy(boxes, img_h=100, img_w=200)
        np.testing.assert_allclose(out, [[50.0, 37.5, 150.0, 62.5]])

    def test_image_level_extraction(self, detr_adapter, rng):
        ex = ImageLvlFeatureExtractor(
            model=detr_adapter, architecture="detr-backbone"
        )
        data = [(f"im{i}", rng.rand(IMG, IMG, 3).astype(np.float32), i)
                for i in range(2)]
        out = ex.get_ls_samples(data, predict_conf=0.0)
        assert out["latent_space_means"].shape == (2, C_BACKBONE)
        assert out["logits"].shape[1] == N_LABELS
        assert np.isfinite(out["latent_space_means"]).all()

    def test_box_features_extraction_and_scoring(self, detr_adapter, rng):
        ex = BoxFeaturesExtractor(
            model=detr_adapter, architecture="detr-backbone",
            roi_output_sizes=[2],
        )
        data = [(f"im{i}", rng.rand(IMG, IMG, 3).astype(np.float32), i)
                for i in range(2)]
        out = ex.get_ls_samples(data, predict_conf=0.0)
        for i in range(2):
            feats = out[i]["latent_space_means"]
            assert feats.shape == (N_QUERIES, C_BACKBONE)
            assert np.isfinite(feats).all()

        # Per-detection OoD scoring over the real backbone features.
        md = MDLatentSpace()
        md.setup(np.concatenate([out[i]["latent_space_means"] for i in range(2)]))
        scores = md.postprocess(out[0]["latent_space_means"])
        assert scores.shape == (N_QUERIES,)
        assert np.isfinite(np.asarray(scores)).all()


class TestDetrFamilyGenericity:
    def test_conditional_detr_sigmoid_scoring(self, rng):
        """ConditionalDETR has no no-object column (sigmoid/focal scheme);
        the adapter must detect that from the logits width."""
        cfg = transformers.ConditionalDetrConfig(
            use_timm_backbone=False, use_pretrained_backbone=False,
            backbone=None,
            backbone_config=transformers.ResNetConfig(
                embedding_size=16, hidden_sizes=[16, 32, 64, C_BACKBONE],
                depths=[1, 1, 1, 1],
            ),
            d_model=D_MODEL, encoder_layers=1, decoder_layers=1,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            num_queries=N_QUERIES, num_labels=N_LABELS,
        )
        torch.manual_seed(0)
        model = transformers.ConditionalDetrForObjectDetection(cfg)
        adapter = HFDetrAdapter(model)
        det = adapter(rng.rand(IMG, IMG, 3).astype(np.float32), predict_conf=0.0)
        assert det.boxes.shape == (N_QUERIES, 4)
        assert det.logits.shape == (N_QUERIES, N_LABELS)
        # sigmoid scores of the raw logits row-max must match
        want = 1 / (1 + np.exp(-det.logits.max(-1)))
        np.testing.assert_allclose(det.scores, want, rtol=1e-5)
        assert det.fmaps[0].shape == (1, C_BACKBONE, IMG // 32, IMG // 32)
