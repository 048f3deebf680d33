"""Functional DropBlock2D and Dropout with exact reference semantics.

The reference depends on the `dropblock` package's DropBlock2D (reference:
runia_core/feature_extraction/utils.py:14, abstract_classes.py:74-79,
image_level.py:117-120), whose semantics are:

  gamma     = drop_prob / block_size**2
  seed mask ~ Bernoulli(gamma) on (B, H, W)       (full spatial extent)
  block     = max_pool2d(seed, block_size, stride=1, padding=block_size//2)
              (trim last row/col when block_size is even)
  keep_mask = 1 - block
  out       = x * keep_mask[:, None] * keep_mask.numel() / keep_mask.sum()

This module reproduces that exactly in JAX, with explicit PRNG keys instead
of torch global RNG state — per-MC-sample keys come from
``jax.random.fold_in`` so the whole MC axis can be vmapped.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["dropblock2d", "dropout"]


@partial(jax.jit, static_argnames=("drop_prob", "block_size", "channel_axis"))
def dropblock2d(
    key: jax.Array,
    x: jnp.ndarray,
    drop_prob: float,
    block_size: int,
    channel_axis: int = 1,
) -> jnp.ndarray:
    """DropBlock2D over a (B, C, H, W) (default) or (B, H, W, C) tensor.

    Matches the `dropblock` package in train mode; ``drop_prob == 0`` is the
    identity (eval mode is simply "don't call this").
    """
    if drop_prob == 0.0:
        return x
    assert x.ndim == 4
    if channel_axis == 1:
        b, _, h, w = x.shape
    elif channel_axis in (3, -1):
        b, h, w, _ = x.shape
    else:
        raise ValueError("channel_axis must be 1 or 3/-1")

    gamma = drop_prob / (block_size**2)
    seed = jax.random.bernoulli(key, gamma, (b, h, w)).astype(x.dtype)

    pad = block_size // 2
    pooled = jax.lax.reduce_window(
        seed,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, block_size, block_size),
        window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad)),
    )
    if block_size % 2 == 0:
        pooled = pooled[:, :-1, :-1]
    keep = 1.0 - pooled  # (B, H, W)

    # Normalization is PER IMAGE (keep.numel()/keep.sum() over each image's
    # own mask). The torch package computes one global scalar over the whole
    # tensor, but the reference only ever calls it with B == 1
    # (runia_core/feature_extraction/abstract_classes.py:237-246), where the
    # two are identical; a global scale at B > 1 would couple every image's
    # activations (and OoD scores) to its batchmates' masks —
    # nondeterministic serving results w.r.t. batch composition.
    scale = (h * w) / jnp.maximum(
        jnp.sum(keep, axis=(1, 2), keepdims=True), 1.0
    )
    if channel_axis == 1:
        out = x * (keep * scale)[:, None, :, :]
    else:
        out = x * (keep * scale)[:, :, :, None]
    return out


@partial(jax.jit, static_argnames=("rate",))
def dropout(key: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout matching torch.nn.Dropout in train mode."""
    if rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
