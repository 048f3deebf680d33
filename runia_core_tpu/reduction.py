"""Dimensionality reduction: PCA (whiten) as an explicit array pytree.

Replaces sklearn.decomposition.PCA (reference: runia_core/
dimensionality_reduction.py:26-87) with a JAX SVD fit. The state is a plain
pytree (mean, components, explained_variance) — serializable with np.savez /
orbax — and ``transform`` is a single jittable matmul.

The reference defaults to svd_solver='randomized'; we compute the exact SVD
(whitening makes the downstream Mahalanobis/KDE scores rotation-invariant, so
only the whitening scale matters — which the exact SVD gets right). A
``randomized`` path via subspace sketching is used automatically for very
wide inputs where the full SVD would dominate fit time.

PaCMAP (visualization only in the reference, dimensionality_reduction.py:
90-177) is CPU-bound in the `pacmap` package; we expose the same API gated on
the optional dependency.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PCAState",
    "pca_fit",
    "pca_from_covariance",
    "pca_transform",
    "apply_pca_ds",
    "apply_pca_ds_split",
    "apply_pca_transform",
    "fit_pacmap",
    "apply_pacmap_transform",
    "plot_samples_pacmap",
]


@jax.tree_util.register_pytree_node_class
@dataclass
class PCAState:
    """Fitted PCA: mean (d,), components (k, d), explained_variance (k,)."""

    mean: jnp.ndarray
    components: jnp.ndarray
    explained_variance: jnp.ndarray
    whiten: bool = True

    def tree_flatten(self):
        return (self.mean, self.components, self.explained_variance), (self.whiten,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, whiten=aux[0])

    # sklearn-compatible surface so reference-style code keeps working
    def transform(self, samples) -> np.ndarray:
        return np.asarray(pca_transform(self, jnp.asarray(np.asarray(samples))))

    @property
    def n_components_(self) -> int:
        return int(self.components.shape[0])


def _randomized_svd(x: jnp.ndarray, k: int, key, oversample: int = 10, iters: int = 4):
    """Halko-style randomized range finder + small SVD (for very wide x)."""
    n, d = x.shape
    p = min(d, k + oversample)
    omega = jax.random.normal(key, (d, p), dtype=x.dtype)
    y = x @ omega
    for _ in range(iters):
        y = x @ (x.T @ y)
        y, _ = jnp.linalg.qr(y)
    q, _ = jnp.linalg.qr(y)
    b = q.T @ x  # (p, d)
    u_b, s, vt = jnp.linalg.svd(b, full_matrices=False)
    return (q @ u_b)[:, :k], s[:k], vt[:k]


def pca_fit(
    samples: Union[np.ndarray, jnp.ndarray],
    n_components: int,
    whiten: bool = True,
    svd_solver: str = "auto",
    seed: int = 0,
) -> Tuple[jnp.ndarray, PCAState]:
    """Fit PCA and return (transformed samples, state).

    Matches sklearn's fit_transform semantics: explained_variance = S^2/(n-1);
    with whiten the transformed data has unit per-component variance.
    """
    x = jnp.asarray(np.asarray(samples))
    n, d = x.shape
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    use_randomized = svd_solver == "randomized" or (
        svd_solver == "auto" and d > 4096 and n_components < 0.2 * d
    )
    if use_randomized:
        u, s, vt = _randomized_svd(xc, n_components, jax.random.key(seed))
    else:
        u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
        u, s, vt = u[:, :n_components], s[:n_components], vt[:n_components]
    # Sign convention (sklearn svd_flip): largest-|.| component loading positive.
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), jnp.argmax(jnp.abs(vt), axis=1)])
    vt = vt * signs[:, None]
    u = u * signs[None, :]
    explained_variance = (s**2) / (n - 1)
    state = PCAState(mean=mean, components=vt, explained_variance=explained_variance,
                     whiten=whiten)
    if whiten:
        transformed = u * jnp.sqrt(n - 1.0)
    else:
        transformed = u * s
    return transformed, state


def pca_from_covariance(
    mean: jnp.ndarray,
    covariance: jnp.ndarray,
    n_samples: int,
    n_components: int,
    whiten: bool = True,
) -> PCAState:
    """Build a PCAState from first/second moments instead of the data matrix.

    Covariance eigenvectors equal the SVD right-singular vectors of the
    centered data (same svd_flip sign convention applied), so this matches
    :func:`pca_fit` whenever the leading eigenvalues are distinct — while
    only needing the O(d^2) moments. Used by streaming fits
    (``ops.linalg.StreamingMoments``) and the distributed fit
    (``parallel.sharded.fit_pca_sharded``). ``covariance`` is the ML (1/n)
    covariance; explained_variance converts to sklearn's 1/(n-1).
    """
    eigvals, eigvecs = jnp.linalg.eigh(covariance)  # ascending
    order = jnp.argsort(-eigvals)[:n_components]
    components = eigvecs[:, order].T  # (k, d)
    explained_variance = eigvals[order] * (n_samples / (n_samples - 1.0))
    signs = jnp.sign(
        components[jnp.arange(n_components),
                   jnp.argmax(jnp.abs(components), axis=1)]
    )
    return PCAState(
        mean=mean,
        components=components * signs[:, None],
        explained_variance=explained_variance,
        whiten=whiten,
    )


@jax.jit
def pca_transform(state: PCAState, samples: jnp.ndarray) -> jnp.ndarray:
    """Project new samples with a fitted PCA (single matmul program)."""
    proj = jnp.matmul(
        samples - state.mean, state.components.T, precision=jax.lax.Precision.HIGHEST
    )
    if state.whiten:
        proj = proj / jnp.sqrt(state.explained_variance)
    return proj


# ---------------------------------------------------------------------------
# Reference-named wrappers (dimensionality_reduction.py:26-87)
# ---------------------------------------------------------------------------
def apply_pca_ds(
    train_samples: np.ndarray,
    test_samples: np.ndarray,
    nro_components: int = 16,
    svd_solver: str = "auto",
    whiten: bool = True,
) -> Tuple[np.ndarray, np.ndarray, PCAState]:
    """Fit on train, transform train and test (reference signature)."""
    train_t, state = pca_fit(train_samples, nro_components, whiten, svd_solver=svd_solver)
    test_t = pca_transform(state, jnp.asarray(np.asarray(test_samples)))
    return np.asarray(train_t), np.asarray(test_t), state


def apply_pca_ds_split(
    samples: np.ndarray,
    nro_components: int = 16,
    svd_solver: str = "auto",
    whiten: bool = True,
) -> Tuple[np.ndarray, PCAState]:
    """Fit+transform one split (reference dimensionality_reduction.py:52-72)."""
    transformed, state = pca_fit(samples, nro_components, whiten, svd_solver=svd_solver)
    return np.asarray(transformed), state


def apply_pca_transform(samples: np.ndarray, pca_transform_state) -> np.ndarray:
    """Transform new samples with a fitted PCA (reference :75-87).

    Accepts a PCAState or any object with ``.transform`` (e.g. sklearn PCA).
    """
    if isinstance(pca_transform_state, PCAState):
        return np.asarray(
            pca_transform(pca_transform_state, jnp.asarray(np.asarray(samples)))
        )
    return pca_transform_state.transform(samples)


# ---------------------------------------------------------------------------
# PaCMAP (optional, visualization only)
# ---------------------------------------------------------------------------
def _require_pacmap():
    try:
        import pacmap  # noqa: F401

        return pacmap
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "pacmap is an optional dependency used only for 2-D visualization; "
            "install it to use fit_pacmap/apply_pacmap_transform."
        ) from exc


def fit_pacmap(samples_ind: np.ndarray, neighbors: int = 25, components: int = 2):
    """2-D PaCMAP embedding (reference dimensionality_reduction.py:142-160)."""
    pacmap = _require_pacmap()
    embedding = pacmap.PaCMAP(
        n_components=components, n_neighbors=neighbors, MN_ratio=0.5, FP_ratio=2.0
    )
    samples_transformed = embedding.fit_transform(samples_ind, init="pca")
    return samples_transformed, embedding


def apply_pacmap_transform(new_samples, original_samples, pm_instance):
    """Transform new samples with a trained PaCMAP (reference :163-177)."""
    return pm_instance.transform(X=new_samples, basis=original_samples)


def plot_samples_pacmap(
    samples_ind: np.ndarray,
    samples_ood: np.ndarray,
    neighbors: int = 25,
    components: int = 2,
    title: str = "Plot Title",
    return_figure: bool = False,
):
    """InD vs OoD 2-D projection plot (reference :90-139)."""
    pacmap = _require_pacmap()
    import matplotlib.pyplot as plt

    samples_concat = np.concatenate((samples_ind, samples_ood))
    labels = np.concatenate(
        (np.zeros((samples_ind.shape[0], 1)), np.ones((samples_ood.shape[0], 1)))
    )
    embedding = pacmap.PaCMAP(
        n_components=components, n_neighbors=neighbors, MN_ratio=0.5, FP_ratio=2.0
    )
    samples_transformed = embedding.fit_transform(samples_concat, init="pca")
    fig, axes = plt.subplots()
    scatter = axes.scatter(
        samples_transformed[:, 0], samples_transformed[:, 1], cmap="brg", c=labels, s=1.5
    )
    axes.set_title(title)
    axes.set_xlabel("PACMAP dimension 1")
    axes.set_ylabel("PACMAP dimension 2")
    axes.legend(
        handles=scatter.legend_elements()[0],
        labels=["In-Distribution", "Out-of-Distribution"],
    )
    if return_figure:
        return fig
    plt.show()
