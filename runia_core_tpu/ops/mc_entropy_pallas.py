"""Fused MC-DropBlock sampling + channel-mean + KL-entropy Pallas kernel.

The LaREx hot path after the model forward is: S DropBlock perturbations of
the feature map -> per-channel means -> per-dimension KL entropy. Composed
from separate ops, the feature map is re-read per sample and the (B, S, C)
sample tensor plus S noised map copies round-trip through HBM. Here the
pipeline is split by cost:

  * the DropBlock *masks* are tiny — (S, B, H*W) floats — and are computed in
    XLA with exactly the same ``jax.random`` stream as the two-step sampler
    (sampling.mc_dropblock_samples), so results are bit-identical;
  * the heavy part — sample formation (an (S, HW) x (HW, C) matmul per image
    on the MXU) and the KL entropy — runs in one Pallas kernel per
    (image-block, channel-tile): the feature map is read from HBM exactly
    once and only the (B, C) entropies are written back.

Entropy semantics match ops/entropy_pallas.py (Chebyshev 1-D marginals,
min_dist clamp, position-based tie handling, k = min(5, S-1)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from runia_core_tpu.ops.dropblock import dropblock2d

__all__ = ["fused_mc_entropy", "mc_dropblock_weights"]

_BIG = 1e30
_B_BLK = 8


def mc_dropblock_weights(
    key: jax.Array,
    batch: int,
    height: int,
    width: int,
    mc_samples: int,
    block_size: int,
    drop_prob: float,
) -> jnp.ndarray:
    """(B, S, H*W) DropBlock keep-weights, bit-matching the two-step sampler.

    Applying dropblock2d to an all-ones map recovers keep * scale exactly
    (same per-sample fold_in key order as sampling.mc_dropblock_samples).
    """
    ones = jnp.ones((batch, 1, height, width), jnp.float32)
    keys = jax.random.split(key, mc_samples)

    def one(k):
        return dropblock2d(k, ones, drop_prob, block_size, channel_axis=1)[:, 0]

    weights = jax.vmap(one)(keys)  # (S, B, H, W)
    return jnp.transpose(weights, (1, 0, 2, 3)).reshape(batch, mc_samples, -1)


def _kernel(w_ref, x_ref, out_ref, samples_ref, *, s: int, k: int, hw: int,
            min_dist: float, const: float):
    """weights (B_BLK, S, HW) + fmap (B_BLK, HW, TILE_C) -> (B_BLK, TILE_C)."""
    b_blk = x_ref.shape[0]

    # Sample clouds: per image an (S, HW) @ (HW, TILE_C) matmul on the MXU;
    # divide by HW for the channel mean. Materialized through VMEM scratch so
    # the entropy stage sees a standard layout (Mosaic mis-lays-out the fused
    # batched-dot result otherwise).
    for bi in range(b_blk):
        samples_ref[bi] = (
            jnp.dot(w_ref[bi], x_ref[bi], preferred_element_type=jnp.float32) / hw
        )
    samples = samples_ref[...]  # (B_BLK, S, TILE_C)

    diffs = jnp.abs(samples[:, :, None, :] - samples[:, None, :, :])
    col_ids = jax.lax.broadcasted_iota(jnp.int32, diffs.shape, 2)
    work = diffs
    kth = None
    for t in range(k + 1):
        kth = jnp.min(work, axis=2)
        if t < k:
            is_min = work <= kth[:, :, None, :]
            first_j = jnp.min(jnp.where(is_min, col_ids, s), axis=2)
            work = jnp.where(col_ids == first_j[:, :, None, :], _BIG, work)
    eps = jnp.maximum(kth, min_dist)
    # The where also forces a standard layout on the reduce result — Mosaic
    # otherwise infers a replicated layout and fails the relayout to log's
    # operand (same pattern as ops/entropy_pallas.py's sentinel masking).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, eps.shape, 1)
    log_terms = jnp.where(row_ids < s, jnp.log(2.0 * eps), 0.0)
    out_ref[...] = const + jnp.sum(log_terms, axis=1) / s


@partial(
    jax.jit,
    static_argnames=(
        "mc_samples", "block_size", "drop_prob", "k", "min_dist", "tile_c", "interpret",
    ),
)
def fused_mc_entropy(
    key: jax.Array,
    fmap: jnp.ndarray,
    mc_samples: int = 16,
    block_size: int = 3,
    drop_prob: float = 0.5,
    k: int = None,
    min_dist: float = 1e-5,
    tile_c: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W, C) feature maps -> (B, C) marginal KL entropies of the
    MC-DropBlock channel-mean clouds, reading the map once.

    Bit-identical (up to matmul association) to
    ``marginal_entropy(mc_dropblock_samples(key, fmap, ...), k)``.
    """
    if k is None:
        k = 5 if mc_samples > 5 else mc_samples - 1
    b, h, w, c = fmap.shape
    hw = h * w
    weights = mc_dropblock_weights(key, b, h, w, mc_samples, block_size, drop_prob)
    x = fmap.reshape(b, hw, c).astype(jnp.float32)

    b_pad = int(np.ceil(b / _B_BLK)) * _B_BLK
    tile_c = min(tile_c, max(128, int(np.ceil(c / 128)) * 128))
    c_pad = int(np.ceil(c / tile_c)) * tile_c
    x_p = jnp.zeros((b_pad, hw, c_pad), jnp.float32).at[:b, :, :c].set(x)
    w_p = jnp.zeros((b_pad, mc_samples, hw), jnp.float32).at[:b].set(weights)

    from scipy.special import digamma

    const = float(-digamma(float(k)) + digamma(float(mc_samples)))
    kernel = partial(_kernel, s=mc_samples, k=k, hw=hw, min_dist=float(min_dist),
                     const=const)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // _B_BLK, c_pad // tile_c),
        in_specs=[
            pl.BlockSpec(
                (_B_BLK, mc_samples, hw), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_B_BLK, hw, tile_c), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_B_BLK, tile_c), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_B_BLK, mc_samples, tile_c), jnp.float32)],
        interpret=interpret,
    )(w_p, x_p)
    return out[:b, :c]
