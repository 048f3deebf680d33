"""Dataset-level entropy API: ``get_dl_h_z`` with the reference's signature.

Reference: runia_core/evaluation/entropy.py:41-93. The reference splits the
stacked MC samples into per-image clouds and loops Python-side (optionally a
process pool); here both the joint h(Z) and the per-dimension h(z_i) are one
batched XLA program each (ops/entropy.py), so ``parallel_run`` is accepted
but meaningless — everything is always parallel.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

from runia_core_tpu.ops.entropy import joint_entropy, marginal_entropy

__all__ = ["get_dl_h_z", "single_image_entropy_calculation", "neighbors_for"]


def neighbors_for(mcd_samples_nro: int) -> int:
    """k = 5 if n > 5 else n - 1 (reference entropy.py:66)."""
    return 5 if mcd_samples_nro > 5 else mcd_samples_nro - 1


def single_image_entropy_calculation(sample: np.ndarray, neighbors: int) -> np.ndarray:
    """Per-dimension KL entropies of one (n, d) cloud (entropy.py:20-38)."""
    sample = np.asarray(sample)
    out = marginal_entropy(jnp.asarray(sample)[None], neighbors)
    return np.asarray(out)[0]


def get_dl_h_z(
    dl_z_samples: Union[np.ndarray, jnp.ndarray],
    mcd_samples_nro: int = 32,
    parallel_run: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Joint h(Z) and marginal h(z_i) per image from stacked MC samples.

    Args:
        dl_z_samples: (n_images * mcd_samples_nro, d) stacked latent samples
            (images contiguous, exactly the reference layout).
        mcd_samples_nro: number of MC samples per image.
        parallel_run: accepted for API parity; always fully parallel here.

    Returns:
        (h_z (n_images, 1), h_z_i (n_images, d)) numpy arrays, matching
        reference entropy.py:41-93 (min_dist=1e-5, max-norm, k=min(5, n-1)).
    """
    del parallel_run
    samples = jnp.asarray(np.asarray(dl_z_samples))
    total, d = samples.shape
    assert total % mcd_samples_nro == 0, (
        "Sample count must be divisible by mcd_samples_nro"
    )
    clouds = samples.reshape(-1, mcd_samples_nro, d)
    k = neighbors_for(mcd_samples_nro)
    h_joint = np.asarray(joint_entropy(clouds, k))[:, None]
    h_marginal = np.asarray(marginal_entropy(clouds, k))
    return h_joint, h_marginal
