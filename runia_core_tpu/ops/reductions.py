"""Activation-map reductions (channel means / stds / variances).

JAX equivalents of the reference's tensor-reduction utils (reference:
runia_core/feature_extraction/utils.py:70-124). All functions accept
(B, C, H, W) activations (the captured-latent layout) and are batch-first:
the reference squeezes away the batch-1 axis; we keep the leading axis so
the same code vmaps over MC samples and images.

Note: the reference uses torch.std/var, which apply Bessel's correction
(ddof=1); that is preserved, including the quirky "std of stds" composition.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "get_mean_or_fullmean_ls_sample",
    "get_variance_ls_sample",
    "get_std_ls_sample",
]


def get_mean_or_fullmean_ls_sample(
    latent_sample: jnp.ndarray, method: str = "fullmean"
) -> jnp.ndarray:
    """'mean': mean over W -> (B, C, H); 'fullmean': mean over H,W -> (B, C).

    Matches reference utils.py:70-92 (minus the batch squeeze).
    """
    assert method in ("mean", "fullmean")
    if method == "mean":
        return jnp.mean(latent_sample, axis=3)
    return jnp.mean(latent_sample, axis=(2, 3))


def get_variance_ls_sample(latent_sample: jnp.ndarray) -> jnp.ndarray:
    """Variance over W, then variance of those over H -> (B, C).

    Reference utils.py:95-108 composes torch.var twice (ddof=1 each time).
    """
    v = jnp.var(latent_sample, axis=3, ddof=1)
    return jnp.var(v, axis=2, ddof=1)


def get_std_ls_sample(latent_sample: jnp.ndarray) -> jnp.ndarray:
    """Std over W, then std of those over H -> (B, C) (utils.py:111-124)."""
    s = jnp.std(latent_sample, axis=3, ddof=1)
    return jnp.std(s, axis=2, ddof=1)
