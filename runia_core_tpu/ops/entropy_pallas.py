"""Pallas TPU kernel for the marginal Kozachenko-Leonenko entropy.

The XLA path (ops/entropy.py) materializes the (B, n, n, d) |xi - xj| tensor
in HBM and sorts it. This kernel keeps everything in VMEM: each grid cell
loads a block of 8 clouds' (n, TILE_D) slices, forms the pairwise differences
in registers, extracts the k-th order statistic with k+1 min-and-mask passes
(position-based masking, so exact duplicates — common after DropBlock
zeroing — are removed one at a time, matching cKDTree), and reduces straight
to the per-dimension entropy rows. HBM traffic drops from O(B n^2 d) to
O(B n d) — the theoretical minimum.

The n axis is padded with +inf sentinel rows, which never win a min and leave
the order statistics of real samples unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["marginal_entropy_pallas"]

_BIG = 1e30
_B_BLK = 8  # clouds per grid cell (satisfies the (8, 128) output tile rule)


def _entropy_kernel(x_ref, out_ref, *, n: int, k: int, min_dist: float, const: float):
    """(B_BLK, n_pad, TILE_D) cloud block -> (B_BLK, TILE_D) entropies."""
    x = x_ref[...]
    n_pad = x.shape[1]
    # Pairwise |x_i - x_j|: (B_BLK, n_pad, n_pad, TILE_D).
    diffs = jnp.abs(x[:, :, None, :] - x[:, None, :, :])
    row_ids = jax.lax.broadcasted_iota(jnp.int32, diffs.shape, 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, diffs.shape, 2)
    work = jnp.where((row_ids < n) & (col_ids < n), diffs, _BIG)

    # k+1 min-extraction passes; the j == i self-distance 0 is pass 0,
    # so pass k yields the k-th nearest neighbor (cKDTree.query(x, k+1)).
    kth = None
    for t in range(k + 1):
        kth = jnp.min(work, axis=2)  # (B_BLK, n_pad, TILE_D)
        if t < k:
            # Mask exactly one occurrence of the minimum per (b, i, dim):
            # the first j achieving it (ties removed one at a time).
            is_min = work <= kth[:, :, None, :]
            first_j = jnp.min(jnp.where(is_min, col_ids, n_pad), axis=2)
            work = jnp.where(col_ids == first_j[:, :, None, :], _BIG, work)

    eps = jnp.maximum(kth, min_dist)
    # Sentinel rows contribute log(2*BIG); zero them before the sum.
    log_terms = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, eps.shape, 1) < n,
        jnp.log(2.0 * eps),
        0.0,
    )
    out_ref[...] = const + jnp.sum(log_terms, axis=1) / n


@partial(jax.jit, static_argnames=("k", "min_dist", "tile_d", "interpret"))
def marginal_entropy_pallas(
    clouds: jnp.ndarray,
    k: int,
    min_dist: float = 1e-5,
    tile_d: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Marginal h(z_i) per cloud and dimension: (B, n, d) -> (B, d).

    Drop-in replacement for ops.entropy.marginal_entropy on TPU; pass
    ``interpret=True`` to run the kernel in interpreter mode off-TPU.
    """
    b, n, d = clouds.shape
    dtype = jnp.float32
    clouds = clouds.astype(dtype)

    # Pad: b to the batch block, n to the sublane tile, d to the lane tile.
    b_pad = int(np.ceil(b / _B_BLK)) * _B_BLK
    n_pad = max(8, int(np.ceil(n / 8)) * 8)
    tile_d = min(tile_d, max(128, int(np.ceil(d / 128)) * 128))
    d_pad = int(np.ceil(d / tile_d)) * tile_d
    padded = jnp.full((b_pad, n_pad, d_pad), _BIG, dtype)
    padded = padded.at[:b, :n, :d].set(clouds)

    from runia_core_tpu.ops.entropy import _digamma_const

    const = _digamma_const(k, n)

    kernel = partial(
        _entropy_kernel, n=n, k=k, min_dist=float(min_dist), const=const
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // _B_BLK, d_pad // tile_d),
        in_specs=[
            pl.BlockSpec(
                (_B_BLK, n_pad, tile_d),
                lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_B_BLK, tile_d), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, d_pad), dtype),
        interpret=interpret,
    )(padded)
    return out[:b, :d]
