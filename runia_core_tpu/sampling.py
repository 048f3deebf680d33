"""Monte-Carlo DropBlock sampling of latent activations.

TPU-native equivalent of the reference's ``MCSamplerModule`` (reference:
runia_core/feature_extraction/abstract_classes.py:33-101): instead of a
torch ModuleList of DropBlock2D layers applied in a Python loop, the MC axis
is a vmapped dimension with per-sample RNG from ``jax.random.fold_in`` — one
XLA program produces all S samples, and an extra vmap level batches over
images (the reference is locked to batch size 1).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.ops.dropblock import dropblock2d, dropout
from runia_core_tpu.ops.reductions import get_mean_or_fullmean_ls_sample

__all__ = ["MCSamplerModule", "mc_dropblock_samples"]


@partial(
    jax.jit,
    static_argnames=(
        "mc_samples", "block_size", "drop_prob", "layer_type", "reduction", "channel_axis",
    ),
)
def mc_dropblock_samples(
    key: jax.Array,
    latent_rep: jnp.ndarray,
    mc_samples: int,
    block_size: int,
    drop_prob: float,
    layer_type: str = "Conv",
    reduction: str = "fullmean",
    channel_axis: int = 1,
) -> jnp.ndarray:
    """Draw S DropBlock-noised samples of one latent map.

    Args:
        latent_rep: (B, C, H, W) activation for ``channel_axis=1`` (the
            reference's torch layout; B=1 reproduces it exactly), or
            (B, H, W, C) for ``channel_axis=3`` (TPU-native NHWC — no
            transposes on the hot path).
        layer_type: 'Conv' reduces each sample to per-channel means
            (fullmean), 'FC'/'RPN' keeps the flattened map
            (abstract_classes.py:95-99).

    Returns:
        (B, S, d) samples where d = C for Conv, C*H*W otherwise.
    """
    if layer_type == "Conv" and reduction == "fullmean":
        # Weights-matmul formulation: DropBlock keep-weights are
        # channel-independent, so the masked channel mean is
        # (keep*scale) @ x / HW. Generating the (B, S, HW) weights on an
        # all-ones map (identical Bernoulli draws and key order — no C axis
        # involved) and contracting once reads the latent map ONCE instead
        # of S times: ~8x less HBM traffic for S=16, the stage's bottleneck
        # (docs/PERFORMANCE.md "MC-DropBlock stage").
        if channel_axis == 1:
            b, c, h, w = latent_rep.shape
            flat = jnp.transpose(latent_rep, (0, 2, 3, 1)).reshape(b, h * w, c)
        else:
            b, h, w, c = latent_rep.shape
            flat = latent_rep.reshape(b, h * w, c)
        ones = jnp.ones((b, 1, h, w), latent_rep.dtype)
        keys = jax.random.split(key, mc_samples)
        weights = jax.vmap(
            lambda k: dropblock2d(k, ones, drop_prob, block_size, channel_axis=1)[:, 0]
        )(keys)  # (S, B, H, W)
        weights = jnp.transpose(weights, (1, 0, 2, 3)).reshape(b, mc_samples, h * w)
        return jnp.einsum("bsp,bpc->bsc", weights, flat) / (h * w)

    keys = jax.random.split(key, mc_samples)

    def one_sample(k):
        noised = dropblock2d(k, latent_rep, drop_prob, block_size, channel_axis=channel_axis)
        if layer_type == "Conv":
            if reduction == "fullmean":
                spatial = (2, 3) if channel_axis == 1 else (1, 2)
                return jnp.mean(noised, axis=spatial)  # (B, C)
            if channel_axis != 1:
                # NHWC 'mean': reduce W, then transpose (B, H, C) -> (B, C, H)
                # before flattening so the feature ordering is C-major —
                # identical to the NCHW path (utils.py
                # get_mean_or_fullmean_ls_sample). Fitted detector state is
                # therefore interchangeable across layouts. Validate like the
                # NCHW path does so unknown reductions fail loudly.
                assert reduction == "mean", (
                    f"Unsupported reduction {reduction!r}: 'mean'/'fullmean'"
                )
                return jnp.mean(noised, axis=2).swapaxes(1, 2).reshape(
                    noised.shape[0], -1
                )
            return get_mean_or_fullmean_ls_sample(noised, reduction).reshape(
                noised.shape[0], -1
            )
        return noised.reshape(noised.shape[0], -1)  # (B, C*H*W)

    samples = jax.vmap(one_sample)(keys)  # (S, B, d)
    return jnp.swapaxes(samples, 0, 1)  # (B, S, d)


class MCSamplerModule:
    """Callable MC-DropBlock sampler with the reference's constructor API
    (abstract_classes.py:51-79).

    Usage::

        sampler = MCSamplerModule(mc_samples=16, block_size=3, drop_prob=0.5)
        samples = sampler(latent_rep, key)   # (S, d) for a (1, C, H, W) input

    Unlike the reference, RNG is explicit: pass a ``jax.random.key``; if
    omitted, an internal counter-folded key is used (convenient, but prefer
    explicit keys for reproducibility).
    """

    def __init__(
        self,
        mc_samples: int,
        block_size: int,
        drop_prob: float,
        layer_type: str = "Conv",
    ):
        assert layer_type in ("Conv", "FC", "RPN")
        self.layer_type = layer_type
        self.mc_samples = mc_samples
        self.block_size = block_size
        self.drop_prob = drop_prob
        self._counter = 0
        self._base_key = jax.random.key(0)

    def __call__(
        self, latent_rep: jnp.ndarray, key: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """(1|B, C, H, W) -> (S, d) for B == 1, else (B, S, d)."""
        if key is None:
            key = jax.random.fold_in(self._base_key, self._counter)
            self._counter += 1
        latent_rep = jnp.asarray(latent_rep)
        squeeze = latent_rep.shape[0] == 1
        out = mc_dropblock_samples(
            key,
            latent_rep,
            self.mc_samples,
            self.block_size,
            self.drop_prob,
            self.layer_type,
        )
        return out[0] if squeeze else out

    # torch-API shims so reference-style code keeps working
    def to(self, device):  # noqa: D401
        return self

    def train(self, mode: bool = True):
        return self

    def eval(self):
        return self
