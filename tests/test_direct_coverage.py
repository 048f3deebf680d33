"""Direct coverage for public surface previously exercised only indirectly:
orbax checkpointing, DetectorKDE, custom registry entries, default_config,
the ResNet-50 bottleneck path, plot helpers, RCNN prediction adjustment,
and the profiler capture."""

import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import matplotlib

matplotlib.use("Agg")


class TestOrbaxCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        from runia_core_tpu.checkpoint import (
            load_state_dict_orbax,
            save_state_dict_orbax,
        )

        state = {
            "mean": jnp.asarray(rng.randn(4).astype(np.float32)),
            "precision": jnp.asarray(rng.randn(4, 4).astype(np.float32)),
        }
        path = tmp_path / "ckpt"
        save_state_dict_orbax(path, state)
        restored = load_state_dict_orbax(path)
        for key in state:
            np.testing.assert_array_equal(
                np.asarray(restored[key]), np.asarray(state[key])
            )


class TestDetectorKDE:
    def test_density_scores_match_kde_fn(self, rng):
        from runia_core_tpu.detectors.latent import DetectorKDE, kde_log_density

        train = rng.randn(50, 8).astype(np.float32)
        test = rng.randn(10, 8).astype(np.float32)
        det = DetectorKDE(train_embeddings=train)
        scores = det.density_fit().get_density_scores(test)
        expected = np.asarray(
            kde_log_density(jnp.asarray(test), jnp.asarray(train), 1.0)
        )
        np.testing.assert_allclose(scores, expected, rtol=1e-6)

    def test_rejects_non_gaussian_kernel(self, rng):
        from runia_core_tpu.detectors.latent import DetectorKDE

        with pytest.raises(AssertionError):
            DetectorKDE(rng.randn(5, 2), kernel="tophat")


class TestRegistry:
    def test_register_custom_postprocessor(self, rng):
        from runia_core_tpu.detectors import postprocessors_dict
        from runia_core_tpu.detectors.base import (
            Postprocessor,
            postprocessor_input_dict,
            register_postprocessor,
        )

        @register_postprocessor("test_norm", postprocessor_input=["features"])
        class NormScorer(Postprocessor):
            def setup(self, ind_train_data, **kwargs):
                self.fitted = True

            def postprocess(self, data, **kwargs):
                return -np.linalg.norm(data, axis=1)

        try:
            assert postprocessors_dict["test_norm"] is NormScorer
            assert postprocessor_input_dict["test_norm"] == ["features"]
            det = NormScorer(cfg=None)
            det.setup(rng.randn(4, 3))
            out = det.postprocess(rng.randn(5, 3))
            assert out.shape == (5,)
        finally:
            postprocessors_dict.pop("test_norm")
            postprocessor_input_dict.pop("test_norm")

    def test_invalid_input_kind_rejected(self):
        from runia_core_tpu.detectors.base import (
            Postprocessor,
            register_postprocessor,
        )

        with pytest.raises(AssertionError):
            @register_postprocessor("bad", postprocessor_input=["pixel_soup"])
            class Bad(Postprocessor):
                pass


class TestDefaultConfig:
    def test_reference_keys_present(self):
        from runia_core_tpu.config import default_config

        cfg = default_config()
        for key in ("n_pca_components", "k_neighbors", "ash_percentile",
                    "gen_gamma", "react_percentile", "dice_percentile",
                    "z_score_thresholds", "num_classes"):
            assert hasattr(cfg, key), key


class TestResNet50:
    def test_bottleneck_forward_and_tap(self, rng):
        """Bottleneck expansion + tap layout on a depth-1 bottleneck stack
        (the 4x-expansion property is per-block; the full (3,4,6,3) RN50
        only multiplied CPU init time)."""
        from runia_core_tpu.models import build_tapped_forward
        from runia_core_tpu.models.resnet import (
            BottleneckResNetBlock,
            ResNet,
        )

        model = ResNet(stage_sizes=(1, 1, 1, 1),
                       block_cls=BottleneckResNetBlock,
                       num_classes=3, cifar_stem=True)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        forward = build_tapped_forward(model, variables)
        logits, taps = forward(
            jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        )
        assert logits.shape == (2, 3)
        assert taps["pre_pool"].shape[-1] == 2048  # 4x bottleneck expansion


class TestPlotHelpers:
    def test_save_scores_plots(self, rng):
        from runia_core_tpu.evaluation.metrics import save_scores_plots

        plots = save_scores_plots(
            rng.randn(40), {"noise": rng.randn(40) - 3}, ["noise"], "ind", "MD"
        )
        assert "noise_MD_scores" in plots

    def test_get_pred_scores_plots(self, rng):
        from runia_core_tpu.evaluation.metrics import get_pred_scores_plots

        experiment = {
            "InD": rng.rand(30),
            "noise": rng.rand(30) + 1,
            "x_axis": "Pred H",
        }
        fig = get_pred_scores_plots(experiment, ["noise"], "Pred H", "InD")
        assert fig is not None

    def test_roc_overlay_figures(self, rng):
        import pandas as pd

        from runia_core_tpu.evaluation.metrics import (
            plot_roc_ood_detector,
            save_roc_ood_detector,
        )

        fpr = np.linspace(0, 1, 20)
        table = pd.DataFrame(
            {
                "fpr": [fpr, fpr],
                "tpr": [fpr ** 0.5, fpr ** 0.3],
                "auroc": [0.8, 0.9],
            },
            index=["MD", "KDE"],
        )
        fig = save_roc_ood_detector(table, ["KDE"], "roc test")
        assert fig is not None
        plot_roc_ood_detector(table, "roc test")  # plt.show() path (Agg)


class TestAdjustPredictionsRCNN:
    def test_relabels_below_threshold(self):
        from runia_core_tpu.inference.object_level import (
            adjust_predictions_faster_rcnn,
        )

        preds = types.SimpleNamespace(det_labels=[0, 1, 2, 0])
        out = adjust_predictions_faster_rcnn(
            preds, np.array([-5.0, 0.5, -9.0, 2.0]), ood_class_number=7,
            threshold=0.0,
        )
        assert out.det_labels == [7, 1, 7, 0]


class TestProfiler:
    def test_tpu_profile_writes_trace(self, tmp_path):
        from runia_core_tpu.utils import tpu_profile

        log_dir = str(tmp_path / "trace")
        with tpu_profile(log_dir):
            jnp.ones((64, 64)) @ jnp.ones((64, 64))
        found = []
        for dirpath, _, files in os.walk(log_dir):
            found.extend(files)
        assert found, "profiler produced no trace files"
