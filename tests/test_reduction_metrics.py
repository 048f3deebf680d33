"""Parity tests: PCA vs sklearn, ROC/PR metrics vs sklearn."""

import numpy as np
import pytest
from sklearn.decomposition import PCA as SkPCA
from sklearn.metrics import (
    auc as sk_auc,
    precision_recall_curve as sk_pr,
    roc_auc_score,
    roc_curve as sk_roc,
)

import jax.numpy as jnp

from runia_core_tpu.evaluation.metrics import (
    auc,
    binary_precision_recall_curve,
    binary_roc,
    get_auroc_results,
    log_evaluate_postprocessors,
    select_and_log_best_larex,
)
from runia_core_tpu.reduction import (
    PCAState,
    apply_pca_ds,
    apply_pca_ds_split,
    apply_pca_transform,
    pca_fit,
    pca_transform,
)


class TestPCA:
    def test_whiten_matches_sklearn_full(self, rng):
        x = rng.randn(300, 24).astype(np.float64)
        ours_t, state = pca_fit(x, 8, whiten=True, svd_solver="full")
        sk = SkPCA(n_components=8, svd_solver="full", whiten=True).fit(x)
        sk_t = sk.transform(x)
        # Components match up to sign; compare absolute values and variances.
        np.testing.assert_allclose(
            np.abs(np.asarray(state.components)), np.abs(sk.components_), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(state.explained_variance), sk.explained_variance_, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.abs(np.asarray(ours_t)), np.abs(sk_t), rtol=1e-3, atol=1e-3
        )

    def test_transform_consistency(self, rng):
        x = rng.randn(200, 16).astype(np.float32)
        new = rng.randn(50, 16).astype(np.float32)
        fit_t, state = pca_fit(x, 4)
        # fit_transform == transform(fit data)
        np.testing.assert_allclose(
            np.asarray(pca_transform(state, jnp.asarray(x))),
            np.asarray(fit_t),
            rtol=1e-3,
            atol=1e-3,
        )
        out = apply_pca_transform(new, state)
        assert out.shape == (50, 4)

    def test_whitened_unit_variance(self, rng):
        x = rng.randn(500, 32).astype(np.float32)
        t, _ = pca_fit(x, 8, whiten=True)
        np.testing.assert_allclose(np.var(np.asarray(t), axis=0, ddof=1), 1.0, rtol=1e-2)

    def test_apply_pca_ds_split_api(self, rng):
        x = rng.randn(100, 16).astype(np.float32)
        reduced, pca = apply_pca_ds_split(x, nro_components=4)
        assert reduced.shape == (100, 4)
        assert isinstance(pca, PCAState)

    def test_apply_pca_ds_api(self, rng):
        tr = rng.randn(100, 16).astype(np.float32)
        te = rng.randn(30, 16).astype(np.float32)
        tr_r, te_r, pca = apply_pca_ds(tr, te, nro_components=4)
        assert tr_r.shape == (100, 4) and te_r.shape == (30, 4)

    def test_randomized_close_to_full(self, rng):
        x = (rng.randn(300, 64) @ rng.randn(64, 64)).astype(np.float32)
        t_full, s_full = pca_fit(x, 4, svd_solver="full")
        t_rand, s_rand = pca_fit(x, 4, svd_solver="randomized")
        np.testing.assert_allclose(
            np.asarray(s_rand.explained_variance),
            np.asarray(s_full.explained_variance),
            rtol=1e-2,
        )

    def test_downstream_rotation_invariance(self, rng):
        """LaREM on whitened PCA output must not depend on component signs."""
        from runia_core_tpu.detectors import MDLatentSpace

        x = rng.randn(300, 32).astype(np.float64)
        test = rng.randn(50, 32).astype(np.float64)

        ours_t, state = pca_fit(x, 8)
        sk = SkPCA(n_components=8, svd_solver="full", whiten=True).fit(x)

        md1, md2 = MDLatentSpace(), MDLatentSpace()
        md1.setup(np.asarray(ours_t))
        md2.setup(sk.transform(x))
        s1 = md1.postprocess(np.asarray(pca_transform(state, jnp.asarray(test))))
        s2 = md2.postprocess(sk.transform(test))
        np.testing.assert_allclose(s1, s2, rtol=1e-3, atol=1e-3)


class TestROCMetrics:
    def test_auroc_matches_sklearn(self, rng):
        scores = rng.randn(500)
        labels = (rng.rand(500) > 0.5).astype(int)
        fpr, tpr, _ = binary_roc(scores, labels)
        assert auc(fpr, tpr) == pytest.approx(roc_auc_score(labels, scores), abs=1e-10)

    def test_roc_curve_matches_sklearn(self, rng):
        scores = rng.randn(200)
        labels = (rng.rand(200) > 0.4).astype(int)
        fpr, tpr, thr = binary_roc(scores, labels)
        sk_fpr, sk_tpr, sk_thr = sk_roc(labels, scores, drop_intermediate=False)
        np.testing.assert_allclose(fpr, sk_fpr)
        np.testing.assert_allclose(tpr, sk_tpr)

    def test_pr_curve_matches_sklearn(self, rng):
        scores = rng.randn(200)
        labels = (rng.rand(200) > 0.4).astype(int)
        precision, recall, _ = binary_precision_recall_curve(scores, labels)
        sk_p, sk_r, _ = sk_pr(labels, scores)
        np.testing.assert_allclose(precision, sk_p)
        np.testing.assert_allclose(recall, sk_r)
        assert auc(recall, precision) == pytest.approx(sk_auc(sk_r, sk_p), abs=1e-12)

    def test_ties_in_scores(self):
        scores = np.array([0.9, 0.9, 0.5, 0.5, 0.1, 0.1])
        labels = np.array([1, 1, 1, 0, 0, 0])
        fpr, tpr, _ = binary_roc(scores, labels)
        assert auc(fpr, tpr) == pytest.approx(roc_auc_score(labels, scores), abs=1e-12)

    def test_get_auroc_results_table(self, rng):
        ind = rng.randn(300) + 2.0
        ood = rng.randn(300)
        table, for_mlflow = get_auroc_results("exp", ind, ood, return_results_for_mlflow=True)
        assert set(table.columns) == {"auroc", "fpr@95", "aupr", "fpr", "tpr"}
        assert 0.85 < table.loc["exp", "auroc"] <= 1.0
        assert "fpr_95" in for_mlflow and "fpr@95" not in for_mlflow
        # Against sklearn on the same concatenation
        scores = np.concatenate([ind, ood])
        labels = np.concatenate([np.ones(300), np.zeros(300)])
        assert table.loc["exp", "auroc"] == pytest.approx(
            roc_auc_score(labels, scores), abs=1e-10
        )

    def test_fpr95_definition(self, rng):
        ind = rng.randn(400) + 1.0
        ood = rng.randn(400)
        table = get_auroc_results("e", ind, ood)
        scores = np.concatenate([ind, ood])
        labels = np.concatenate([np.ones(400), np.zeros(400)])
        sk_fpr, sk_tpr, _ = sk_roc(labels, scores, drop_intermediate=False)
        expected = sk_fpr[np.where(sk_tpr >= 0.95)[0][0]]
        assert table.loc["e", "fpr@95"] == pytest.approx(expected, abs=1e-12)


class TestJaxAUROC:
    def test_matches_sklearn(self, rng):
        from runia_core_tpu.evaluation.metrics import jax_auroc

        ind = rng.randn(300) + 1.0
        ood = rng.randn(250)
        ours = float(jax_auroc(ind, ood))
        scores = np.concatenate([ind, ood])
        labels = np.concatenate([np.ones(300), np.zeros(250)])
        assert ours == pytest.approx(roc_auc_score(labels, scores), abs=1e-6)

    def test_ties(self):
        from runia_core_tpu.evaluation.metrics import jax_auroc

        ind = np.array([0.9, 0.5, 0.5, 0.1])
        ood = np.array([0.5, 0.5, 0.1, 0.0])
        expected = roc_auc_score(
            np.concatenate([np.ones(4), np.zeros(4)]), np.concatenate([ind, ood])
        )
        assert float(jax_auroc(ind, ood)) == pytest.approx(expected, abs=1e-6)

    def test_jittable(self, rng):
        import jax
        from runia_core_tpu.evaluation.metrics import jax_auroc

        f = jax.jit(jax_auroc)
        out = float(f(jnp.asarray(rng.randn(64) + 1), jnp.asarray(rng.randn(64))))
        assert 0.0 <= out <= 1.0


class TestLogBaselinesNegation:
    def test_pred_h_and_mi_negated(self, rng):
        """pred_h / mi scores are negated before AUROC so higher = InD
        (reference latent_space.py:257-261)."""
        from runia_core_tpu.evaluation import log_baselines
        import pandas as pd

        # pred_h: OoD has HIGHER entropy -> after negation InD scores higher
        ind_scores = rng.rand(100) + 0.0
        ood_scores = rng.rand(100) + 2.0
        df = log_baselines(
            baselines_names=["pred_h"],
            ind_dataset="ind",
            ind_data_dict={"pred_h": ind_scores},
            ood_baselines_scores={"far pred_h": ood_scores},
            ood_datasets=["far"],
            overall_metrics_df=pd.DataFrame(
                columns=["auroc", "fpr@95", "aupr", "fpr", "tpr"]
            ),
            mlflow_logging=False,
            logs_folder=None,
        )
        assert df.loc["far pred_h", "auroc"] > 0.95


class TestEvalHarness:
    def test_log_evaluate_postprocessors(self, rng):
        d = 16
        ind_train = rng.randn(300, d).astype(np.float32)
        ind_valid = rng.randn(100, d).astype(np.float32)
        ood = rng.randn(100, d).astype(np.float32) + 2.0
        ind_dict = {
            "train latent_space_means": ind_train,
            "valid latent_space_means": ind_valid,
            "train labels": rng.randint(0, 4, 300),
            "valid labels": rng.randint(0, 4, 100),
        }
        ood_dict = {
            "far latent_space_means": ood,
            "far labels": rng.randint(0, 4, 100),
        }
        results = log_evaluate_postprocessors(
            ind_dict, ood_dict, ["far"], return_density_scores="LaREM"
        )
        df = results["results_df"]
        assert "far LaRED" in df.index and "far LaREM" in df.index and "far LaREK" in df.index
        # Density methods separate the shifted OoD cleanly; LaREK works on
        # L2-normalized vectors where the mean shift mostly cancels, so only
        # sanity-check it.
        assert df.loc["far LaRED", "auroc"] > 0.8
        assert df.loc["far LaREM", "auroc"] > 0.8
        assert 0.0 <= df.loc["far LaREK", "auroc"] <= 1.0
        assert results["InD"].shape == (100,)

    def test_select_best_larex(self, rng):
        import pandas as pd

        df = pd.DataFrame(
            {
                "auroc": [0.8, 0.9, 0.85],
                "fpr@95": [0.5, 0.3, 0.4],
                "aupr": [0.7, 0.88, 0.8],
                "fpr": [[0], [0], [0]],
                "tpr": [[1], [1], [1]],
            },
            index=["ood1 LaREM", "ood1 LaREM PCA 16", "ood1 LaREM PCA 32"],
        )
        best_auroc, best_aupr, best_fpr, best_n = select_and_log_best_larex(
            df, [16, 32], "LaREM", multiple_ood_datasets_flag=False
        )
        assert best_auroc == pytest.approx(0.9)
        assert best_n == 16
