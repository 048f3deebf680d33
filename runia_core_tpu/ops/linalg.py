"""Shared linear-algebra kernels for the OoD scorers (pure JAX/XLA).

These replace the reference's sklearn/BLAS and torch.distributions native
dependencies (reference: runia_core/inference/postprocessors.py:18-19,
runia_core/inference/funcs.py:16,332-335) with jittable XLA programs that map
onto the TPU MXU: covariance and quadratic forms are single matmuls, the MVN
log-prob is a batched Cholesky solve.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "empirical_covariance",
    "empirical_precision",
    "class_means",
    "classwise_center",
    "mvn_fit_cholesky",
    "mvn_log_prob",
    "mahalanobis_quadform",
    "pinvh",
    "StreamingMoments",
]


class StreamingMoments:
    """Out-of-core first/second-moment accumulator.

    Fitting LaREM or PCA only needs first/second moments and n; this
    accumulates them batch by batch on device (one rank-``b`` matmul per
    update, f32 HIGHEST precision) so datasets far larger than HBM/host RAM
    fit in O(d²) state. Accumulation is SHIFTED by the first batch's mean:
    the naive E[xxᵀ] − μμᵀ one-pass formula cancels catastrophically in f32
    when |μ| ≫ σ (typical post-ReLU activations) — with the shift, the
    subtraction happens in near-zero-mean coordinates where it is benign.
    ``mean``/``covariance`` agree with ``empirical_covariance`` over the
    concatenated batches to f32 roundoff; feed them to
    ``reduction.pca_from_covariance`` or ``pinvh`` for the detector states.
    """

    def __init__(self, dim: int, dtype=jnp.float32):
        self.s1 = jnp.zeros((dim,), dtype)
        self.s2 = jnp.zeros((dim, dim), dtype)
        self.shift = None  # set from the first batch's mean
        self.n = 0

    @staticmethod
    @jax.jit
    def _accumulate(s1, s2, shift, batch):
        batch = batch.astype(s1.dtype) - shift[None, :]
        return (
            s1 + jnp.sum(batch, axis=0),
            s2 + jnp.matmul(batch.T, batch, precision=jax.lax.Precision.HIGHEST),
        )

    def update(self, batch) -> "StreamingMoments":
        batch = jnp.asarray(batch)
        if self.shift is None:
            self.shift = jnp.mean(batch.astype(self.s1.dtype), axis=0)
        self.s1, self.s2 = self._accumulate(
            self.s1, self.s2, self.shift, batch
        )
        self.n += int(batch.shape[0])
        return self

    @property
    def mean(self) -> jnp.ndarray:
        return self.shift + self.s1 / self.n

    @property
    def covariance(self) -> jnp.ndarray:
        """ML covariance (1/n), as sklearn EmpiricalCovariance."""
        m = self.s1 / self.n  # mean in shifted coordinates (≈ 0)
        return self.s2 / self.n - jnp.outer(m, m)

    @property
    def precision(self) -> jnp.ndarray:
        return pinvh(self.covariance)

    def md_state(self) -> dict:
        """LaREM detector state ({"feats_mean", "precision"}), as
        ``detectors.MDLatentSpace.setup`` would fit on the full data."""
        return {"feats_mean": self.mean[None, :], "precision": self.precision}


def empirical_covariance(x: jnp.ndarray, assume_centered: bool = False) -> jnp.ndarray:
    """Maximum-likelihood covariance, matching sklearn's EmpiricalCovariance.

    sklearn divides by ``n`` (not ``n - 1``) and subtracts the mean unless
    ``assume_centered`` (reference usage: postprocessors.py:217-220 for MD,
    funcs.py:62-66 for class-shared Mahalanobis, postprocessors.py:1066-1068
    for ViM with ``assume_centered=True``).
    """
    n = x.shape[0]
    if not assume_centered:
        x = x - jnp.mean(x, axis=0, keepdims=True)
    return jnp.matmul(x.T, x, precision=jax.lax.Precision.HIGHEST) / n


def pinvh(a: jnp.ndarray) -> jnp.ndarray:
    """Hermitian pseudo-inverse (sklearn uses scipy.linalg.pinvh for precision_)."""
    return jnp.linalg.pinv(a, hermitian=True)


def empirical_precision(x: jnp.ndarray, assume_centered: bool = False) -> jnp.ndarray:
    """Precision (inverse covariance) as sklearn's ``EmpiricalCovariance.precision_``."""
    return pinvh(empirical_covariance(x, assume_centered=assume_centered))


def class_means(x: jnp.ndarray, labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Per-class feature means; classes with no samples yield NaN rows.

    Matches the reference semantics where ``class_samples.mean(0)`` of an empty
    slice is NaN and downstream scoring maps NaN class scores to -inf
    (funcs.py:52-59,95; postprocessors.py:296-306,350).
    """
    labels = labels.astype(jnp.int32)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=x.dtype)  # (n, C)
    counts = jnp.sum(one_hot, axis=0)  # (C,)
    sums = jnp.matmul(one_hot.T, x, precision=jax.lax.Precision.HIGHEST)  # (C, d)
    means = sums / counts[:, None]
    return jnp.where(counts[:, None] > 0, means, jnp.nan)


def classwise_center(
    x: jnp.ndarray, labels: jnp.ndarray, means: jnp.ndarray
) -> jnp.ndarray:
    """Subtract each sample's class mean (rows stay in dataset order).

    The reference concatenates per-class centered blocks before fitting the
    shared covariance (funcs.py:53-64); since covariance is permutation
    invariant, centering in dataset order is numerically identical.
    """
    labels = labels.astype(jnp.int32)
    return x - means[labels]


def shared_class_precision(
    x: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
    warn_label: str = "class",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(class_means, shared precision of class-centered data).

    This is the Mahalanobis/cMD fit (funcs.py:33-66), the single
    implementation behind ``cMDLatentSpace.setup``, ``Mahalanobis.setup``,
    and ``mahalanobis_preprocess``: per-class means, then an sklearn
    EmpiricalCovariance (``assume_centered=False``) on the pooled
    class-centered data (f32). Classes with no samples get a warning and
    contribute zero rows, matching the reference.
    """
    import warnings

    import numpy as np

    counts = np.bincount(
        np.asarray(labels).astype(np.int64), minlength=num_classes
    )
    for c in np.nonzero(counts == 0)[0]:
        warnings.warn(f"No examples for {warn_label} {c}")
    means = class_means(x, labels, num_classes)
    centered = classwise_center(x, labels, means)
    # All rows belong to some observed class, so no NaNs can enter `centered`
    # unless labels point at empty classes, which cannot happen by construction.
    precision = empirical_precision(
        centered.astype(jnp.float32), assume_centered=False
    )
    return means, precision


def mahalanobis_quadform(
    x: jnp.ndarray, mean: jnp.ndarray, precision: jnp.ndarray
) -> jnp.ndarray:
    """diag((x - mean) P (x - mean)^T) without materializing the full product.

    One fused matmul + rowwise reduction; this is the LaREM hot path
    (postprocessors.py:240-243).
    """
    diff = x - mean
    return jnp.sum(
        jnp.matmul(diff, precision, precision=jax.lax.Precision.HIGHEST) * diff,
        axis=-1,
    )


def classwise_mahalanobis_max(
    x: jnp.ndarray, means: jnp.ndarray, precision: jnp.ndarray
) -> jnp.ndarray:
    """max over classes of -(x-mu_c) P (x-mu_c)^T with NaN classes -> -inf.

    Replaces the reference's per-sample per-class Python loops
    (funcs.py:88-100, postprocessors.py:341-355) with one batched computation:
    the cross term is a single (N, C) matmul program.
    """
    # -(x-m) P (x-m)^T = -(xPx - 2 xPm + mPm)
    xp = jnp.matmul(x, precision, precision=jax.lax.Precision.HIGHEST)  # (N, d)
    x_quad = jnp.sum(xp * x, axis=-1, keepdims=True)  # (N, 1)
    cross = jnp.matmul(xp, means.T, precision=jax.lax.Precision.HIGHEST)  # (N, C)
    m_quad = jnp.sum(
        jnp.matmul(means, precision, precision=jax.lax.Precision.HIGHEST) * means,
        axis=-1,
    )  # (C,)
    scores = -(x_quad - 2.0 * cross + m_quad[None, :])  # (N, C)
    scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
    return jnp.max(scores, axis=1)


def mvn_fit_cholesky(covariances: jnp.ndarray, jitters=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Cholesky with the reference's jitter ladder.

    The reference adds ONE shared jitter to every class covariance and
    retries until the whole stack is accepted by
    torch.distributions.MultivariateNormal (funcs.py:287,325-343) — so a
    singular covariance in one class perturbs the healthy classes too.
    Replicated exactly: the first ladder rung that makes ALL classes PD is
    applied to all of them (per-class selection would change healthy-class
    log-probs vs the reference).

    Args:
        covariances: (C, d, d) stacked per-class covariance matrices.

    Returns:
        (chol, jitter_used): (C, d, d) Cholesky factors and (C,) jitter
        values (one shared value, broadcast per class for API stability).

    Raises:
        ValueError: no ladder rung makes the stack PD (the reference's
        loud ValueError after exhausting its ladder).
    """
    import numpy as np

    if jitters is None:
        jitters = [0.0] + [10.0**e for e in range(-20, 0)]
    d = covariances.shape[-1]
    eye = jnp.eye(d, dtype=covariances.dtype)
    num_classes = covariances.shape[0]

    for jitter in jitters:
        candidate = jnp.linalg.cholesky(covariances + jitter * eye)  # (C, d, d)
        if bool(np.asarray(jnp.all(jnp.isfinite(candidate)))):
            return candidate, jnp.full(
                (num_classes,), jitter, dtype=covariances.dtype
            )
    raise ValueError(
        "mvn_fit_cholesky: covariances not positive-definite for any jitter "
        f"in the ladder (max tried {jitters[-1]:g})"
    )


@partial(jax.jit, static_argnames=())
def mvn_log_prob(x: jnp.ndarray, means: jnp.ndarray, chols: jnp.ndarray) -> jnp.ndarray:
    """Batched multivariate-normal log-density.

    Matches ``torch.distributions.MultivariateNormal(loc, covariance).log_prob``
    (funcs.py:332-335, postprocessors.py:490-491): for each sample and class,
    logp = -0.5 (d log 2pi + 2 sum log diag L + ||L^-1 (x-mu)||^2).

    Args:
        x: (N, d) samples.
        means: (C, d) per-class means.
        chols: (C, d, d) per-class Cholesky factors.

    Returns:
        (N, C) log-probabilities.
    """
    d = x.shape[-1]
    diff = x[:, None, :] - means[None, :, :]  # (N, C, d)
    # Solve L z = diff for each class: (C, d, d) @ (C, d, N)
    diff_t = jnp.transpose(diff, (1, 2, 0))  # (C, d, N)
    z = jax.scipy.linalg.solve_triangular(chols, diff_t, lower=True)  # (C, d, N)
    maha = jnp.sum(z * z, axis=1).T  # (N, C)
    log_det = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chols, axis1=-2, axis2=-1)), axis=-1
    )  # (C,)
    return -0.5 * (d * jnp.log(2.0 * jnp.pi) + log_det[None, :] + maha)
