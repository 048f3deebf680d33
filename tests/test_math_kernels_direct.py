"""Direct tests for math kernels previously covered only through the
detectors that use them: linalg (vs sklearn/scipy), kNN search, entropy
helpers, MCD predictive uncertainty, and the pacmap gate."""

import numpy as np
import pytest
from scipy.linalg import pinvh as scipy_pinvh
from scipy.stats import multivariate_normal
from sklearn.covariance import EmpiricalCovariance

import jax
import jax.numpy as jnp


class TestLinalg:
    def test_empirical_covariance_matches_sklearn(self, rng):
        from runia_core_tpu.ops.linalg import empirical_covariance

        x = rng.randn(40, 6).astype(np.float64)
        ours = np.asarray(empirical_covariance(jnp.asarray(x)))
        ref = EmpiricalCovariance(assume_centered=False).fit(x).covariance_
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)

    def test_empirical_precision_matches_sklearn(self, rng):
        from runia_core_tpu.ops.linalg import empirical_precision

        x = rng.randn(60, 5).astype(np.float64)
        ours = np.asarray(empirical_precision(jnp.asarray(x)))
        ref = EmpiricalCovariance(assume_centered=False).fit(x).precision_
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    def test_pinvh_matches_scipy(self, rng):
        from runia_core_tpu.ops.linalg import pinvh

        a = rng.randn(6, 6)
        sym = (a + a.T) / 2
        np.testing.assert_allclose(
            np.asarray(pinvh(jnp.asarray(sym))), scipy_pinvh(sym),
            rtol=1e-4, atol=1e-6,
        )

    def test_shared_class_precision(self, rng):
        from runia_core_tpu.ops.linalg import shared_class_precision

        x = rng.randn(30, 4).astype(np.float64)
        labels = rng.randint(0, 3, 30)
        means, precision = shared_class_precision(
            jnp.asarray(x), jnp.asarray(labels), 3
        )
        # reference: per-class centering then pooled EmpiricalCovariance
        centered = x - np.stack([np.asarray(means)[l] for l in labels])
        ref = EmpiricalCovariance(assume_centered=False).fit(centered).precision_
        np.testing.assert_allclose(np.asarray(precision), ref, rtol=1e-4, atol=1e-6)

    def test_mvn_log_prob_matches_scipy(self, rng):
        from runia_core_tpu.ops.linalg import mvn_fit_cholesky, mvn_log_prob

        a = rng.randn(4, 4)
        cov = a @ a.T + 0.5 * np.eye(4)
        mean = rng.randn(4)
        chols, _ = mvn_fit_cholesky(jnp.asarray(cov)[None])
        x = rng.randn(10, 4)
        ours = np.asarray(
            mvn_log_prob(jnp.asarray(x), jnp.asarray(mean)[None], chols)
        )[:, 0]
        ref = multivariate_normal(mean, cov).logpdf(x)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestKnnSearch:
    def test_matches_numpy_bruteforce(self, rng):
        from runia_core_tpu.ops.knn import knn_search

        train = rng.randn(100, 8).astype(np.float32)
        test = rng.randn(20, 8).astype(np.float32)
        dists, idx = knn_search(jnp.asarray(test), jnp.asarray(train), k=5)
        d2 = ((test[:, None] - train[None]) ** 2).sum(-1)
        ref_idx = np.argsort(d2, axis=1)[:, :5]
        ref_d = np.sort(d2, axis=1)[:, :5]
        np.testing.assert_allclose(np.asarray(dists), ref_d, rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    def test_row_chunking_identical(self, rng):
        from runia_core_tpu.ops.knn import knn_search

        train = rng.randn(64, 4).astype(np.float32)
        test = rng.randn(10, 4).astype(np.float32)
        d1, i1 = knn_search(jnp.asarray(test), jnp.asarray(train), 3, row_chunk=4)
        d2, i2 = knn_search(jnp.asarray(test), jnp.asarray(train), 3, row_chunk=1024)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestEntropyHelpers:
    def test_single_image_matches_batched(self, rng):
        from runia_core_tpu.evaluation.entropy import (
            single_image_entropy_calculation,
        )
        from runia_core_tpu.ops.entropy import marginal_entropy

        cloud = rng.randn(8, 6).astype(np.float32)
        single = single_image_entropy_calculation(cloud, 5)
        batched = np.asarray(marginal_entropy(jnp.asarray(cloud)[None], 5))[0]
        np.testing.assert_allclose(single, batched, rtol=1e-6)

    def test_batched_cloud_entropies(self, rng):
        from runia_core_tpu.ops.entropy import (
            batched_cloud_entropies,
            joint_entropy,
            marginal_entropy,
        )

        clouds = jnp.asarray(rng.randn(3, 8, 5).astype(np.float32))
        joint, marginal = batched_cloud_entropies(clouds, 5)
        np.testing.assert_allclose(
            np.asarray(joint), np.asarray(joint_entropy(clouds, 5)), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(marginal), np.asarray(marginal_entropy(clouds, 5)),
            rtol=1e-6,
        )


class TestMCDPredictiveUncertainty:
    def test_entropy_and_mi(self, rng):
        from runia_core_tpu.detectors.funcs import get_mcd_pred_uncertainty_score

        logits_table = jnp.asarray(rng.randn(4, 6, 3).astype(np.float32))

        def forward_fn(key, images):
            idx = jax.random.randint(key, (), 0, 4)
            return logits_table[idx]

        probs, pred_h, mi = get_mcd_pred_uncertainty_score(
            forward_fn, jnp.zeros((6, 2)), jax.random.key(0), mcd_nro_samples=4
        )
        assert probs.shape == (6, 4, 3)
        assert pred_h.shape == (6,) and mi.shape == (6,)
        # MI = pred_H - E[H]; both non-negative for any prob table
        assert (np.asarray(pred_h) >= -1e-6).all()
        assert (np.asarray(mi) >= -1e-5).all()


class TestPacmapGate:
    def test_missing_pacmap_raises_informatively(self, rng):
        import importlib.util

        from runia_core_tpu.reduction import fit_pacmap

        if importlib.util.find_spec("pacmap") is not None:
            pytest.skip("pacmap installed")
        with pytest.raises((ImportError, ModuleNotFoundError)):
            fit_pacmap(rng.randn(30, 5))


class TestStreamingMoments:
    def test_matches_batch_fit(self, rng):
        from runia_core_tpu.ops.linalg import StreamingMoments, empirical_covariance
        from sklearn.covariance import EmpiricalCovariance

        x = rng.randn(200, 8).astype(np.float32)
        sm = StreamingMoments(8)
        for start in range(0, 200, 32):  # ragged last chunk (200 % 32 != 0)
            sm.update(x[start:start + 32])
        assert sm.n == 200
        np.testing.assert_allclose(np.asarray(sm.mean), x.mean(0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sm.covariance),
            np.asarray(empirical_covariance(jnp.asarray(x))),
            rtol=1e-3, atol=1e-5,
        )
        ref_prec = EmpiricalCovariance().fit(x).precision_
        np.testing.assert_allclose(np.asarray(sm.precision), ref_prec, rtol=5e-2, atol=1e-2)

    def test_md_state_matches_detector(self, rng):
        from runia_core_tpu.detectors import MDLatentSpace
        from runia_core_tpu.ops.linalg import StreamingMoments

        x = rng.randn(150, 6).astype(np.float32)
        sm = StreamingMoments(6)
        for start in range(0, 150, 50):
            sm.update(x[start:start + 50])
        streamed = sm.md_state()

        md = MDLatentSpace()
        md.setup(x)
        test = rng.randn(12, 6).astype(np.float32)
        from runia_core_tpu.detectors.latent import md_score

        ours = np.asarray(md_score(
            jnp.asarray(test), streamed["feats_mean"], streamed["precision"]
        ))
        ref = md.postprocess(test)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    def test_pca_from_streaming_moments(self, rng):
        from runia_core_tpu.ops.linalg import StreamingMoments
        from runia_core_tpu.reduction import pca_fit, pca_from_covariance, pca_transform

        x = rng.randn(300, 10).astype(np.float32)
        sm = StreamingMoments(10)
        for start in range(0, 300, 64):
            sm.update(x[start:start + 64])
        state = pca_from_covariance(sm.mean, sm.covariance, sm.n, 4)
        _, ref_state = pca_fit(x, n_components=4, svd_solver="full")
        test = jnp.asarray(rng.randn(15, 10).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(pca_transform(state, test)),
            np.asarray(pca_transform(ref_state, test)),
            rtol=5e-2, atol=1e-2,
        )
