"""Tests for the full evaluation harness: calculate_all_baselines +
log_evaluate_larex (baselines -> full-vector -> PCA sweep -> best ->
thresholds -> plots)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from runia_core_tpu.config import Config
from runia_core_tpu.evaluation import (
    calculate_all_baselines,
    get_labels_from_logits,
    log_evaluate_larex,
    remove_latent_features,
)
from runia_core_tpu.detectors import get_baselines_thresholds

ALL_BASELINES = [
    "vim", "msp", "raw", "knn", "energy", "ash", "gen", "react",
    "dice", "dice_react", "mdist", "ddu",
]


@pytest.fixture
def detection_data(rng):
    d, num_classes = 24, 4
    w = rng.randn(num_classes, d).astype(np.float32) * 0.3
    b = rng.randn(num_classes).astype(np.float32) * 0.1

    def feats(n, shift=0.0):
        labels = rng.randint(0, num_classes, n)
        centers = rng.randn(num_classes, d) * 1.5
        return (np.abs(centers[labels] + rng.randn(n, d)) + shift).astype(np.float32)

    train_f = feats(300)
    valid_f = feats(120)
    ood_f = feats(120, shift=2.0)
    ind = {
        "train features": train_f,
        "valid features": valid_f,
        "train logits": train_f @ w.T + b,
        "valid logits": valid_f @ w.T + b,
        "train latent_space_means": train_f,
        "valid latent_space_means": valid_f,
    }
    ood = {
        "far features": ood_f,
        "far logits": ood_f @ w.T + b,
        "far latent_space_means": ood_f,
    }
    cfg = Config(
        num_classes=num_classes,
        k_neighbors=5,
        ash_percentile=85,
        gen_gamma=0.1,
        react_percentile=90,
        dice_percentile=90,
        ood_datasets=["far"],
        ind_dataset="synth",
        n_pca_components=[4, 8],
        mlflow_experiment_name="test",
    )
    return ind, ood, {"weight": w, "bias": b}, cfg


class TestCalculateAllBaselines:
    def test_all_twelve_baselines(self, detection_data):
        ind, ood, fc, cfg = detection_data
        ind_out, ood_out, scores = calculate_all_baselines(
            baselines_names=ALL_BASELINES,
            ind_data_dict=ind,
            ood_data_dict=ood,
            fc_params=fc,
            cfg=cfg,
            num_classes=4,
        )
        for name in ALL_BASELINES:
            assert name in ind_out, name
            assert f"far {name}" in scores, name
            assert np.isfinite(ind_out[name]).all(), name
            assert ind_out[name].shape == (120,), name

    def test_thresholds(self, detection_data):
        ind, ood, fc, cfg = detection_data
        ind_out, _, scores = calculate_all_baselines(
            ["msp", "raw", "energy"], ind, ood, fc, cfg, 4
        )
        th = get_baselines_thresholds(["msp", "raw", "energy"], ind_out)
        assert th["raw"] == 0.0
        s = ind_out["msp"]
        assert th["msp"] == pytest.approx(s.mean() - 1.645 * s.std(), rel=1e-5)

    def test_gen_class_limit(self, detection_data):
        ind, ood, fc, cfg = detection_data
        with pytest.raises(ValueError):
            calculate_all_baselines(["gen"], ind, ood, fc, cfg, num_classes=25)

    def test_labels_from_logits_background_strip(self, rng):
        logits21 = rng.randn(50, 21).astype(np.float32)
        id_data = {"train logits": logits21.copy(), "valid logits": logits21.copy()}
        ood_data = {"x logits": logits21.copy()}
        id_out, ood_out = get_labels_from_logits(id_data, ood_data, ["x"])
        assert id_out["train labels"].max() < 20  # background class stripped
        np.testing.assert_array_equal(
            id_out["train labels"], np.argmax(logits21[:, :-1], axis=-1)
        )

    def test_remove_latent_features(self, detection_data):
        ind, ood, _, _ = detection_data
        ind_out, ood_out = remove_latent_features(dict(ind), dict(ood), ["far"])
        assert "train features" not in ind_out
        assert "far features" not in ood_out


class TestLogEvaluateLarex:
    def test_full_sweep(self, detection_data, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        ind, ood, fc, cfg = detection_data
        ind_out, ood_out, baselines_scores = calculate_all_baselines(
            ["msp", "energy"], ind, ood, fc, cfg, 4
        )
        df, best, thresholds, ood_final = log_evaluate_larex(
            cfg=cfg,
            baselines_names=["msp", "energy"],
            ood_baselines_scores=baselines_scores,
            ind_data_dict=ind_out,
            ood_data_dict=ood_out,
            mlflow_run_name="test_run",
            mlflow_logging=False,
            postprocessors=["LaRED", "LaREM"],
        )
        # baselines + 2 postprocessors x (full + 2 PCA settings)
        assert "far msp" in df.index and "far energy" in df.index
        assert "far LaREM" in df.index
        assert "far LaREM PCA 4" in df.index and "far LaREM PCA 8" in df.index
        assert "LaREM" in best and "best" in best
        assert len(thresholds) == 2
        # OoD scores for the best config were attached to the data dict
        best_larem = best["LaREM"]["best_comp"]
        assert f"far {best_larem}" in ood_final
        # The shifted OoD must be separable by LaREM somewhere in the sweep
        assert best["LaREM"]["auroc"] > 0.9
