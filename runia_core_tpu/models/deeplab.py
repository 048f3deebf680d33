"""DeepLabv3+ semantic segmentation with feature taps (flax, TPU-native).

The reference's segmentation workflow drives a user-supplied torch
DeepLabv3+ through ``deeplabv3p_get_ls_mcd_samples`` (reference
image_level.py:580-631, hooking the model's dropout layer). This module
gives the framework its own runnable DeepLabv3+ so that workflow is
self-contained: dilated ResNet backbone (output-stride 16/8 via atrous
stages — ``ResNet(output_stride=...)``), ASPP context head with image-level
pooling, and the v3+ decoder with a low-level skip.

Taps (all NHWC):

  - ``stem``/``block1..4``: backbone stages (block4 at 1/OS resolution)
  - ``aspp`` and its alias ``pre_pool``: the ASPP projection output — the
    natural MC-DropBlock insertion point (the reference hooks the dropout
    immediately after this projection in torch DeepLabv3+)
  - ``decoder``: pre-classifier decoder features at 1/4 resolution
  - ``penultimate``: global-pooled ASPP features (B, C) for the
    feature-space detectors

Upsampling uses ``jax.image.resize`` bilinear with ``antialias=False``
(align-corners-free, the torch ``interpolate(..., align_corners=False)``
convention). All convs are bias-free + BatchNorm, MXU-friendly channel
counts (256/48 defaults from the paper).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from runia_core_tpu.models.resnet import BottleneckResNetBlock, ResNet, ResNetBlock

__all__ = ["ASPP", "DeepLabV3Plus"]


def _resize(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC maps in f32 (resolution changes are the one
    place where bf16 rounding visibly banding-artifacts dense predictions)."""
    out_shape = (x.shape[0], hw[0], hw[1], x.shape[-1])
    return jax.image.resize(
        x.astype(jnp.float32), out_shape, method="bilinear", antialias=False
    )


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling: 1x1 + three dilated 3x3 branches +
    image-level pooling, concatenated and projected to ``features``."""

    features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        branches = [nn.relu(norm()(conv(self.features, (1, 1))(x)))]
        for rate in self.rates:
            branches.append(
                nn.relu(
                    norm()(
                        conv(
                            self.features, (3, 3),
                            kernel_dilation=(rate, rate),
                        )(x)
                    )
                )
            )
        # Image-level pooling: global mean -> 1x1 -> broadcast back. The
        # broadcast replaces the bilinear upsample of a 1x1 map (identical
        # result, no gather).
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(norm()(conv(self.features, (1, 1), name="image_pool")(pooled)))
        branches.append(
            jnp.broadcast_to(
                pooled, (x.shape[0], x.shape[1], x.shape[2], self.features)
            )
        )
        y = jnp.concatenate(branches, axis=-1)
        return nn.relu(norm(name="proj_bn")(conv(self.features, (1, 1), name="proj")(y)))


class DeepLabV3Plus(nn.Module):
    """DeepLabv3+ with a dilated-ResNet backbone and taps.

    Returns ``(logits (B, H, W, num_classes), taps)``.
    """

    num_classes: int = 21
    backbone_stages: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    backbone_block: Any = BottleneckResNetBlock
    num_filters: int = 64
    output_stride: int = 16
    aspp_features: int = 256
    low_level_features: int = 48
    aspp_rates: Sequence[int] = (6, 12, 18)
    # Decoder dropout (torch DeepLabv3+ puts 0.5 before the classifier).
    # 0.0 = deterministic. When > 0, pass an rng key to activate MC noise:
    # ``model.apply(vars, x, rngs={"dropout": key})`` — the stochastic
    # forward `inference.build_pixel_uncertainty_scorer` consumes.
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        taps: Dict[str, jnp.ndarray] = {}
        in_hw = (x.shape[1], x.shape[2])

        if len(self.backbone_stages) < 2:
            raise ValueError(
                "DeepLabV3Plus needs a backbone with >= 2 stages (the "
                "decoder skips from block1; ASPP reads the last stage)"
            )
        _, bb_taps = ResNet(
            stage_sizes=tuple(self.backbone_stages),
            block_cls=self.backbone_block,
            num_classes=0,
            num_filters=self.num_filters,
            dtype=self.dtype,
            output_stride=self.output_stride,
            include_head=False,
            name="backbone",
        )(x, train=train)
        n_stages = len(self.backbone_stages)
        for k in ["stem"] + [f"block{i + 1}" for i in range(n_stages)]:
            if k in bb_taps:
                taps[k] = bb_taps[k]

        a = ASPP(
            features=self.aspp_features,
            rates=tuple(self.aspp_rates),
            dtype=self.dtype,
            name="aspp",
        )(bb_taps[f"block{n_stages}"], train=train)
        taps["aspp"] = a
        taps["pre_pool"] = a  # standard LaREx tap name (the reference hooks
        # the dropout right after this projection)
        taps["penultimate"] = jnp.mean(a, axis=(1, 2))

        # Decoder: upsample ASPP to 1/4, concat projected low-level, refine.
        low = bb_taps["block1"]
        low = nn.relu(
            norm(name="low_bn")(
                conv(self.low_level_features, (1, 1), name="low_proj")(low)
            )
        )
        up = _resize(a, (low.shape[1], low.shape[2])).astype(low.dtype)
        y = jnp.concatenate([up, low], axis=-1)
        y = nn.relu(norm(name="dec_bn1")(conv(self.aspp_features, (3, 3), name="dec1")(y)))
        y = nn.relu(norm(name="dec_bn2")(conv(self.aspp_features, (3, 3), name="dec2")(y)))
        taps["decoder"] = y
        if self.dropout_rate > 0.0:
            # Active whenever a "dropout" rng is supplied (MC-at-inference
            # is the point); deterministic if no key is given.
            y = nn.Dropout(
                self.dropout_rate,
                deterministic=not self.has_rng("dropout"),
            )(y)

        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(y)
        logits = _resize(logits, in_hw)
        return logits, taps
