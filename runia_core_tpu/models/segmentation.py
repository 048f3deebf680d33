"""Semantic-segmentation model with feature taps.

The reference's original use case was DeepLabv3+ uncertainty (the deprecated
``deeplabv3p_get_ls_mcd_samples`` helper, reference image_level.py:580-631,
hooks the model's dropout layer). This flax encoder-decoder gives the
framework a runnable segmentation family: the encoder bottleneck is the
LaREx tap point, and the decoder produces per-pixel class logits.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["SimpleSegmenter"]


class SimpleSegmenter(nn.Module):
    """Small encoder-decoder segmenter (DeepLab-style layout) with taps.

    Returns (per-pixel logits (B, H, W, num_classes), taps) where taps
    include ``bottleneck``/``pre_pool`` — the MC-DropBlock insertion point
    used by the LaREx flow.
    """

    num_classes: int = 8
    features: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps: Dict[str, jnp.ndarray] = {}
        # Encoder: two stride-2 stages
        e1 = nn.relu(nn.Conv(self.features, (3, 3), strides=(2, 2), name="enc1")(x))
        e2 = nn.relu(nn.Conv(self.features * 2, (3, 3), strides=(2, 2), name="enc2")(e1))
        # Atrous-style context block at the bottleneck
        b = nn.relu(
            nn.Conv(self.features * 4, (3, 3), kernel_dilation=(2, 2), name="aspp")(e2)
        )
        taps["bottleneck"] = b
        taps["pre_pool"] = b  # standard LaREx tap name

        # Decoder: upsample + skip connection
        bh, bw = b.shape[1], b.shape[2]
        up1 = jnp.repeat(jnp.repeat(b, 2, axis=1), 2, axis=2)
        up1 = nn.relu(nn.Conv(self.features * 2, (3, 3), name="dec1")(
            jnp.concatenate([up1, e1], axis=-1)
        ))
        up2 = jnp.repeat(jnp.repeat(up1, 2, axis=1), 2, axis=2)
        logits = nn.Conv(self.num_classes, (1, 1), name="head")(up2)
        return logits, taps
