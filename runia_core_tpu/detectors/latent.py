"""Latent-space postprocessors: KDE (LaRED), MD (LaREM), cMD, KNN (LaREK), GMM (LaREG).

TPU-native equivalents of the reference's latent-space scorers
(runia_core/inference/postprocessors.py:78-492). The fit/score math is pure
JAX: the KDE log-density and kNN search are single matmul programs on the MXU
instead of sklearn Cython / faiss C++ (SURVEY.md section 2.2), and the
reference's per-sample Python loops (postprocessors.py:341-355,415-423) are
batched away.

Registry aliases: the README quickstart uses LaRED/LaREM/LaREK names that do
not exist in the reference code (SURVEY.md section 7.4); here they are real
aliases of KDE/MD/KNN.
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.detectors.base import Postprocessor, register_postprocessor
from runia_core_tpu.detectors.funcs import gmm_fit, normalizer
from runia_core_tpu.ops.linalg import (
    classwise_mahalanobis_max,
    empirical_precision,
    mahalanobis_quadform,
    shared_class_precision,
)
from runia_core_tpu.ops.knn import squared_l2_distances, squared_l2_kth_neighbor

__all__ = [
    "DetectorKDE",
    "KDELatentSpace",
    "MDLatentSpace",
    "cMDLatentSpace",
    "KNNLatentSpace",
    "GMMLatentSpace",
    "LaREDPostprocessor",
    "LaREMPostprocessor",
    "LaREKPostprocessor",
    "LaREGPostprocessor",
]

ndarray = np.ndarray


# ---------------------------------------------------------------------------
# Functional cores (jittable)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("row_chunk",))
def kde_log_density(test: jnp.ndarray, train: jnp.ndarray,
                    bandwidth: float = 1.0, row_chunk: int = 1024) -> jnp.ndarray:
    """Gaussian-KDE log density, matching sklearn KernelDensity.score_samples.

    log p(x) = logsumexp_i(-||x - t_i||^2 / (2 h^2)) - log n - (d/2) log(2 pi h^2)

    Matmul-based distances (ops.knn.squared_l2_distances — the reference
    uses sklearn's Cython KDE, postprocessors.py:109-128), with test rows
    chunked through ``lax.map`` so the distance matrix never exceeds
    (row_chunk, N_train) whatever the test-set size.
    """
    n, d = train.shape
    norm = jnp.log(n * 1.0) + 0.5 * d * jnp.log(2.0 * jnp.pi * bandwidth**2)
    n_test = test.shape[0]
    pad = (-n_test) % row_chunk
    chunks = jnp.pad(test, ((0, pad), (0, 0))).reshape(-1, row_chunk, d)

    def one_chunk(chunk):
        sq_dists = squared_l2_distances(chunk, train)
        return jax.scipy.special.logsumexp(
            -0.5 * sq_dists / (bandwidth**2), axis=1
        )

    return jax.lax.map(one_chunk, chunks).reshape(-1)[:n_test] - norm


@jax.jit
def md_score(test: jnp.ndarray, mean: jnp.ndarray, precision: jnp.ndarray) -> jnp.ndarray:
    """-(x-mu) P (x-mu)^T — the LaREM score (postprocessors.py:240-243)."""
    return -mahalanobis_quadform(test, mean, precision)


# ---------------------------------------------------------------------------
# Class facades (reference API)
# ---------------------------------------------------------------------------
class DetectorKDE:
    """Gaussian KDE density estimator (reference postprocessors.py:78-128)."""

    def __init__(self, train_embeddings, save_path=None, kernel="gaussian", bandwidth=1.0):
        assert kernel == "gaussian", "Only the gaussian kernel is supported"
        self.kernel = kernel
        self.bandwidth = bandwidth
        self.train_embeddings = jnp.asarray(train_embeddings)
        self.save_path = save_path
        self.density = self  # fitted lazily; kept for API parity

    def density_fit(self):
        return self

    def get_density_scores(self, test_embeddings) -> ndarray:
        return np.asarray(
            kde_log_density(jnp.asarray(test_embeddings), self.train_embeddings, self.bandwidth)
        )


@register_postprocessor(["KDE", "LaRED"], postprocessor_input=["latent_space_means"])
class KDELatentSpace(Postprocessor):
    """LaRED: KDE log-density over latent entropies (postprocessors.py:131-178)."""

    def __init__(self, cfg=None):
        super().__init__(cfg)
        self.detector: Optional[DetectorKDE] = None

    def setup(self, ind_train_data: ndarray, **kwargs) -> None:
        assert np.ndim(ind_train_data) == 2, "ind_feats must be 2 dimensional"
        if self._warn_if_fitted("KDEPostprocessor"):
            return
        self.detector = DetectorKDE(train_embeddings=ind_train_data)
        self._state = {"train_embeddings": self.detector.train_embeddings,
                       "bandwidth": self.detector.bandwidth}
        self._setup_flag = True

    def postprocess(self, test_data: ndarray, **kwargs) -> ndarray:
        assert np.ndim(test_data) == 2, "ood_feats must be 2 dimensional"
        return self.detector.get_density_scores(test_data)

    def _rehydrate(self) -> None:
        self.detector = DetectorKDE(
            train_embeddings=self._state["train_embeddings"],
            bandwidth=float(np.asarray(self._state.get("bandwidth", 1.0))),
        )


@register_postprocessor(["MD", "LaREM"], postprocessor_input=["latent_space_means"])
class MDLatentSpace(Postprocessor):
    """LaREM: Mahalanobis distance to the InD mean (postprocessors.py:181-244).

    The reference centers the data and then lets EmpiricalCovariance subtract
    the (near-zero) residual mean again (postprocessors.py:213-220); we
    replicate the double-centering exactly.
    """

    def __init__(self, cfg=None):
        super().__init__(cfg)
        self.feats_mean: Optional[ndarray] = None
        self.precision: Optional[ndarray] = None

    def setup(self, ind_train_data: ndarray, **kwargs) -> None:
        assert np.ndim(ind_train_data) == 2, "ind_feats must be 2 dimensional"
        if self._warn_if_fitted("MDPostprocessor"):
            return
        x = jnp.asarray(ind_train_data)
        self.feats_mean = jnp.mean(x, axis=0, keepdims=True)
        centered = x - self.feats_mean
        # assume_centered=False: the residual mean is subtracted again.
        self.precision = empirical_precision(centered, assume_centered=False)
        self._state = {"feats_mean": self.feats_mean, "precision": self.precision}
        self._setup_flag = True

    def postprocess(self, test_data: ndarray, **kwargs) -> ndarray:
        assert np.ndim(test_data) == 2, "test_feats must be 2 dimensional"
        return np.asarray(md_score(jnp.asarray(test_data), self.feats_mean, self.precision))


@register_postprocessor("cMD", postprocessor_input=["latent_space_means"])
class cMDLatentSpace(Postprocessor):
    """Class-conditional LaREM (postprocessors.py:247-357): per-class means,
    shared precision on class-centered data, max-over-classes score with
    NaN (empty class) -> -inf."""

    def __init__(self, cfg=None):
        super().__init__(cfg)
        try:
            self.num_classes = cfg.num_classes
        except AttributeError:
            self.num_classes = 10
        self.class_mean: Optional[ndarray] = None
        self.precision: Optional[ndarray] = None

    def setup(self, ind_train_data: ndarray, **kwargs) -> None:
        try:
            ind_train_labels = kwargs["ind_train_labels"]
        except KeyError:
            raise ValueError(
                "id_labels not provided. Pass ID train labels as 'ind_train_labels' argument."
            )
        assert np.ndim(ind_train_data) == 2, "ind_feats must be 2 dimensional"
        if self._warn_if_fitted("cMDPostprocessor"):
            return
        x = jnp.asarray(ind_train_data)
        labels = jnp.asarray(np.asarray(ind_train_labels))
        self.class_mean, self.precision = shared_class_precision(
            x, labels, self.num_classes,
            warn_label="class (class-wise Mahalanobis)",
        )
        self._state = {"class_mean": self.class_mean, "precision": self.precision}
        self._setup_flag = True

    def postprocess(self, test_data: ndarray, **kwargs) -> ndarray:
        if "pred_labels" not in kwargs:
            raise ValueError("pred_logits not provided")
        assert np.ndim(test_data) == 2, "test_feats must be 2 dimensional"
        return np.asarray(
            classwise_mahalanobis_max(jnp.asarray(test_data), self.class_mean, self.precision)
        )


@register_postprocessor(["KNN", "LaREK"], postprocessor_input=["latent_space_means"])
class KNNLatentSpace(Postprocessor):
    """kNN distance in normalized latent space (postprocessors.py:360-423).

    faiss IndexFlatL2 returns *squared* L2 distances; the score is the negated
    squared distance to the K-th neighbor, reproduced here with a matmul
    distance program + top-k instead of the faiss C++ index.
    """

    def __init__(self, cfg=None):
        super().__init__(cfg)
        try:
            self.K = cfg.k_neighbors
        except AttributeError:
            self.K = 50
        self.activation_log: Optional[ndarray] = None

    def setup(self, ind_train_data: ndarray, **kwargs) -> None:
        assert np.ndim(ind_train_data) == 2, "ind_train_feats must be 2 dimensional"
        if self._warn_if_fitted("KNNPostprocessor"):
            return
        self.activation_log = jnp.asarray(normalizer(np.asarray(ind_train_data)))
        self._state = {"activation_log": self.activation_log, "K": self.K}
        self._setup_flag = True

    def postprocess(self, test_data: ndarray, **kwargs) -> ndarray:
        assert np.ndim(test_data) == 2, "test_feats must be 2 dimensional"
        test = jnp.asarray(normalizer(np.asarray(test_data)))
        kth_sq_dist = squared_l2_kth_neighbor(test, self.activation_log, self.K)
        return np.asarray(-kth_sq_dist)


@register_postprocessor(["GMM", "LaREG"], postprocessor_input=["latent_space_means"])
class GMMLatentSpace(Postprocessor):
    """LaREG: per-class MVN mixture, logsumexp score (postprocessors.py:426-492)."""

    def __init__(self, cfg=None):
        super().__init__(cfg)
        try:
            self.num_classes = cfg.num_classes
        except AttributeError:
            self.num_classes = 10
        self.gmm = None

    def setup(self, ind_train_data: ndarray, **kwargs) -> None:
        assert np.ndim(ind_train_data) == 2, "ind_train_feats must be 2 dimensional"
        if self._warn_if_fitted("GMMPostprocessor"):
            return
        try:
            ind_predicted_labels = kwargs["ind_train_labels"]
        except KeyError:
            raise ValueError("id_labels not provided")
        self.gmm, _ = gmm_fit(
            embeddings=np.asarray(ind_train_data),
            labels=np.asarray(ind_predicted_labels),
            num_classes=self.num_classes,
        )
        self._state = {"means": self.gmm.means, "chols": self.gmm.chols}
        self._setup_flag = True

    def postprocess(self, test_data: ndarray, **kwargs) -> ndarray:
        assert np.ndim(test_data) == 2, "test_feats must be 2 dimensional"
        log_probs = self.gmm.log_prob(jnp.asarray(test_data))
        return np.asarray(jax.scipy.special.logsumexp(log_probs, axis=1))

    def _rehydrate(self) -> None:
        from runia_core_tpu.detectors.funcs import GMMState

        self.gmm = GMMState(
            means=jnp.asarray(self._state["means"]),
            chols=jnp.asarray(self._state["chols"]),
            jitter=jnp.zeros(self._state["means"].shape[0]),
        )


# README-facing aliases (SURVEY.md section 7.1 — make the quickstart names real)
LaREDPostprocessor = KDELatentSpace
LaREMPostprocessor = MDLatentSpace
LaREKPostprocessor = KNNLatentSpace
LaREGPostprocessor = GMMLatentSpace
