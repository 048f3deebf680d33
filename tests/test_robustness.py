"""Failure-handling robustness (SURVEY.md section 5 "Failure detection"):
jitter ladder on singular covariances, NaN-class -inf handling, threshold
edge cases."""

import numpy as np
import pytest

import jax.numpy as jnp

from runia_core_tpu.detectors import (
    GMMLatentSpace,
    Mahalanobis,
    cMDLatentSpace,
    get_method_threshold,
    gmm_fit,
)
from runia_core_tpu.config import Config


class TestJitterLadder:
    def test_rank_deficient_covariance(self, rng):
        """A class whose samples live on a low-rank subspace has a singular
        covariance; the jitter ladder (reference funcs.py:287,325-343) must
        still produce a usable Cholesky."""
        d = 8
        base = rng.randn(30, 2) @ rng.randn(2, d)  # rank-2 data in 8-d
        feats = np.concatenate([base, rng.randn(30, d)]).astype(np.float32)
        labels = np.concatenate([np.zeros(30), np.ones(30)]).astype(int)
        state, jitter = gmm_fit(feats, labels, num_classes=2)
        assert jitter > 0  # the ladder had to engage
        logp = np.asarray(state.log_prob(feats[:5]))
        assert np.isfinite(logp).all()

    def test_single_sample_class(self, rng):
        """n == 1 per class uses the divide-by-one guard (funcs.py:289-294)."""
        feats = rng.randn(11, 4).astype(np.float32)
        labels = np.array([0] * 10 + [1])
        state, _ = gmm_fit(feats, labels, num_classes=2)
        assert state.means.shape[0] == 2
        assert np.isfinite(np.asarray(state.log_prob(feats[:3]))).all()


class TestNaNClassHandling:
    def test_cmd_missing_class_warns_and_scores(self, rng):
        feats = rng.randn(40, 6).astype(np.float32)
        labels = rng.randint(0, 2, 40)  # classes 2,3 empty
        cmd = cMDLatentSpace(cfg=Config(num_classes=4))
        with pytest.warns(UserWarning, match="No examples for class"):
            cmd.setup(feats, ind_train_labels=labels)
        scores = cmd.postprocess(rng.randn(5, 6).astype(np.float32),
                                 pred_labels=np.zeros(5))
        assert np.isfinite(scores).all()  # NaN classes mapped to -inf, max over rest

    def test_mahalanobis_missing_class(self, rng):
        feats = rng.randn(40, 6).astype(np.float32)
        labels = rng.randint(0, 2, 40)
        m = Mahalanobis(num_classes=3)
        with pytest.warns(UserWarning):
            m.setup(feats, train_labels=labels, valid_feats=feats[:10])
        assert np.isfinite(m.postprocess(feats[:5])).all()

    def test_gmm_latent_space_drops_empty(self, rng):
        feats = rng.randn(40, 6).astype(np.float32)
        labels = rng.randint(0, 2, 40)
        g = GMMLatentSpace(cfg=Config(num_classes=5))
        g.setup(feats, ind_train_labels=labels)
        assert g.gmm.means.shape[0] == 2
        assert np.isfinite(g.postprocess(feats[:5])).all()


class TestThresholdEdges:
    def test_constant_scores(self):
        # std == 0 -> threshold == mean
        assert get_method_threshold(np.full(10, 3.0), 1.645) == pytest.approx(3.0)

    def test_custom_z(self, rng):
        s = rng.randn(100)
        assert get_method_threshold(s, 2.0) == pytest.approx(s.mean() - 2 * s.std())
