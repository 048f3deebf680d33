"""DETR checkpoint conversion: flax DETR vs transformers, torch-free serving.

convert_hf_detr must reproduce the eval-mode HF forward (logits/boxes), and
DetrJaxAdapter must emit the same DetectionResult the torch-backed
HFDetrAdapter does for the SAME checkpoint — proving a reference user's DETR
checkpoint can switch to the TPU-native path with identical detections
(reference runia_core/feature_extraction/abstract_classes.py:410-518).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.extraction.hf_adapters import HFDetrAdapter
from runia_core_tpu.extraction.object_level import BoxFeaturesExtractor
from runia_core_tpu.models import DetrJaxAdapter, convert_hf_detr

IMG = 64
N_QUERIES = 7
N_LABELS = 5
D_MODEL = 32


@pytest.fixture(scope="module")
def hf_detr():
    cfg = transformers.DetrConfig(
        use_timm_backbone=False,
        use_pretrained_backbone=False,
        backbone_config=transformers.ResNetConfig(
            embedding_size=4, hidden_sizes=[16, 32], depths=[1, 1],
            layer_type="bottleneck",
        ),
        d_model=D_MODEL,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        num_queries=N_QUERIES,
        num_labels=N_LABELS,
    )
    torch.manual_seed(0)
    return transformers.DetrForObjectDetection(cfg).eval()


@pytest.fixture(scope="module")
def converted(hf_detr):
    return convert_hf_detr(hf_detr)


class TestConvertHFDetr:
    def test_logits_and_boxes_match_hf_eval(self, hf_detr, converted):
        model, variables = converted
        x = np.random.RandomState(0).rand(2, IMG, IMG, 3).astype(np.float32)
        with torch.no_grad():
            ref = hf_detr(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                pixel_mask=torch.ones(2, IMG, IMG, dtype=torch.long),
            )
        outputs, taps = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(outputs["logits"]), ref.logits.numpy(),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(outputs["pred_boxes"]), ref.pred_boxes.numpy(),
            rtol=1e-4, atol=1e-6,
        )
        assert taps["decoder_queries"].shape == (2, N_QUERIES, D_MODEL)

    def test_timm_backbone_rejected(self, hf_detr):
        object.__setattr__(hf_detr.config, "use_timm_backbone", True)
        try:
            with pytest.raises(NotImplementedError, match="timm"):
                convert_hf_detr(hf_detr)
        finally:
            object.__setattr__(hf_detr.config, "use_timm_backbone", False)

    def test_nonstandard_backbone_widths_rejected(self, hf_detr):
        cfg = transformers.DetrConfig(
            use_timm_backbone=False, use_pretrained_backbone=False,
            backbone_config=transformers.ResNetConfig(
                embedding_size=4, hidden_sizes=[16, 24], depths=[1, 1],
                layer_type="bottleneck",
            ),
            d_model=D_MODEL, encoder_layers=1, decoder_layers=1,
            encoder_attention_heads=4, decoder_attention_heads=4,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            num_queries=N_QUERIES, num_labels=N_LABELS,
        )
        torch.manual_seed(1)
        odd = transformers.DetrForObjectDetection(cfg).eval()
        with pytest.raises(NotImplementedError, match="hidden_sizes"):
            convert_hf_detr(odd)


class TestDetrJaxAdapter:
    def test_matches_torch_adapter_detections(self, hf_detr, converted):
        """Same checkpoint, same image: the torch-backed HFDetrAdapter and
        the converted JAX adapter must keep the same detections with the
        same boxes, scores, classes, and features."""
        model, variables = converted
        jax_adapter = DetrJaxAdapter(model, variables)
        torch_adapter = HFDetrAdapter(hf_detr)

        image = np.random.RandomState(1).rand(IMG, IMG, 3).astype(np.float32)
        dj = jax_adapter(image, predict_conf=0.1)
        dt = torch_adapter(image, predict_conf=0.1)

        assert dj.boxes.shape == dt.boxes.shape
        np.testing.assert_allclose(dj.boxes, dt.boxes, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(dj.scores, dt.scores, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(dj.classes, dt.classes)
        np.testing.assert_allclose(dj.logits, dt.logits, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            dj.features, dt.features, rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            dj.fmaps[0], dt.fmaps[0], rtol=1e-3, atol=1e-4
        )

    def test_object_level_extraction_torch_free(self, converted):
        """The converted model drives the per-detection extraction + scoring
        stack through the standard DetectionResult protocol."""
        model, variables = converted
        adapter = DetrJaxAdapter(model, variables)
        ex = BoxFeaturesExtractor(
            model=adapter, architecture="detr-backbone", roi_output_sizes=[2],
        )
        rng = np.random.RandomState(2)
        data = [(f"im{i}", rng.rand(IMG, IMG, 3).astype(np.float32), i)
                for i in range(2)]
        out = ex.get_ls_samples(data, predict_conf=0.0)
        feats = np.concatenate([out[i]["latent_space_means"] for i in range(2)])
        assert feats.shape == (2 * N_QUERIES, 32)
        assert np.isfinite(feats).all()

        md = MDLatentSpace()
        md.setup(feats)
        scores = md.postprocess(out[0]["latent_space_means"])
        assert np.isfinite(np.asarray(scores)).all()
