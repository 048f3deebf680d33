"""Mesh-sharded detector fitting and scoring.

The capability the TPU build adds over the reference (SURVEY.md section 2.4):

* ``sharded_mean_and_covariance``: moment accumulation over a train set
  sharded across the ``data`` axis — local partial sums + ``psum`` over ICI,
  so fitting LaREM/Mahalanobis never gathers the raw features;
* ``fit_md_sharded``: LaREM fit from sharded data (identical numerics to
  MDLatentSpace.setup: ML covariance of mean-centered data);
* ``sharded_kde_log_density`` / ``sharded_knn_score``: scoring against a
  *train bank sharded over the mesh* — each device scans its shard, a cheap
  O(N) / O(N k) collective merges results;
* ``data_parallel_scorer``: wrap any jitted scorer so batches are sharded
  over the data axis (XLA partitions the whole fused program).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from runia_core_tpu.ops.knn import squared_l2_distances
from runia_core_tpu.ops.linalg import pinvh

__all__ = [
    "sharded_mean_and_covariance",
    "fit_md_sharded",
    "fit_pca_sharded",
    "sharded_kde_log_density",
    "sharded_knn_score",
    "data_parallel_scorer",
]


def sharded_mean_and_covariance(
    x: jnp.ndarray, mesh: Mesh, axis: str = "data"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, ML covariance) of a (N, d) set sharded over ``axis``.

    Communication: one psum of (d,), (d, d) and a scalar — never the data.
    Matches sklearn EmpiricalCovariance(assume_centered=False):
    cov = E[x x^T] - mean mean^T, divided by N.
    """
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(), P(), P()),
    )
    def stats(xs):
        n_local = jnp.asarray(xs.shape[0], jnp.float32)
        s1 = jax.lax.psum(jnp.sum(xs, axis=0), axis)
        s2 = jax.lax.psum(
            jnp.matmul(xs.T, xs, precision=jax.lax.Precision.HIGHEST), axis
        )
        n = jax.lax.psum(n_local, axis)
        return s1, s2, n

    s1, s2, n = stats(x)
    mean = s1 / n
    cov = s2 / n - jnp.outer(mean, mean)
    return mean, cov


def fit_md_sharded(x: jnp.ndarray, mesh: Mesh, axis: str = "data"):
    """LaREM fit over a sharded train set: {"feats_mean", "precision"}."""
    mean, cov = sharded_mean_and_covariance(x, mesh, axis)
    return {"feats_mean": mean[None, :], "precision": pinvh(cov)}


def fit_pca_sharded(
    x: jnp.ndarray,
    mesh: Mesh,
    n_components: int,
    whiten: bool = True,
    axis: str = "data",
):
    """Fit PCA over a sharded train set without gathering it.

    Eigendecomposition of the psum-accumulated (d, d) covariance replaces
    the SVD of the centered data matrix — identical components (up to the
    same svd_flip sign convention ``reduction.pca_fit`` applies) as long as
    the leading eigenvalues are distinct, at O(d^2) communication instead of
    O(N·d). Returns a :class:`runia_core_tpu.reduction.PCAState`; note
    explained_variance uses sklearn's 1/(N-1) scaling while the covariance
    accumulates with 1/N, hence the correction factor.
    """
    from runia_core_tpu.reduction import pca_from_covariance

    mean, cov = sharded_mean_and_covariance(x, mesh, axis)
    return pca_from_covariance(mean, cov, x.shape[0], n_components, whiten)


def sharded_kde_log_density(
    test: jnp.ndarray,
    train_shard: jnp.ndarray,
    n_total: int,
    axis: str = "data",
    bandwidth: float = 1.0,
) -> jnp.ndarray:
    """Gaussian-KDE log density against a sharded train bank.

    Call inside shard_map with ``train_shard`` split over ``axis`` and
    ``test`` replicated. Per-shard logsumexp + a max/psum pair over ICI.
    """
    d = train_shard.shape[1]
    sq = squared_l2_distances(test, train_shard)
    log_kernel = -0.5 * sq / (bandwidth**2)
    # Stable global logsumexp across shards.
    local_max = jnp.max(log_kernel, axis=1)
    global_max = jax.lax.pmax(local_max, axis)
    local_sum = jnp.sum(jnp.exp(log_kernel - global_max[:, None]), axis=1)
    global_sum = jax.lax.psum(local_sum, axis)
    lse = global_max + jnp.log(global_sum)
    norm = jnp.log(n_total * 1.0) + 0.5 * d * jnp.log(2.0 * jnp.pi * bandwidth**2)
    return lse - norm


def sharded_knn_score(
    test: jnp.ndarray, train_shard: jnp.ndarray, k: int, axis: str = "data"
) -> jnp.ndarray:
    """-squared distance to the global k-th NN over a sharded bank.

    Local top-k per shard, all_gather of the (N, k) candidates, final merge:
    O(N k) bytes over ICI instead of O(N N_train).
    """
    neg_local, _ = jax.lax.top_k(-squared_l2_distances(test, train_shard), k)
    gathered = jax.lax.all_gather(neg_local, axis, axis=1)  # (N, S, k)
    merged, _ = jax.lax.top_k(gathered.reshape(test.shape[0], -1), k)
    return merged[:, -1]  # == -(kth smallest distance)


def data_parallel_scorer(
    scorer: Callable, mesh: Mesh, axis: str = "data"
) -> Callable:
    """Shard the batch axis of a (images, key) scorer over the mesh.

    The scorer's captured state (PCA, detector) is replicated; XLA partitions
    the fused program so forward, MC sampling, entropy, and scoring all run
    data-parallel with zero code changes.
    """
    def sharded(images, key):
        images = jax.device_put(
            images, NamedSharding(mesh, P(axis, *([None] * (images.ndim - 1))))
        )
        return scorer(images, key)

    return sharded
