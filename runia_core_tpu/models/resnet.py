"""Flax ResNet family with built-in feature taps.

The reference probes user-supplied torch models with mutable forward hooks
(reference: runia_core/feature_extraction/utils.py:27-56). The TPU-native
design inverts this: models *return* named intermediates ("taps") alongside
their outputs, so feature extraction is pure, jittable, and vmappable
(SURVEY.md section 7.1 "feature taps instead of hooks").

Every model here returns ``(logits, taps)`` where taps is a dict of
intermediates in NHWC (TPU-native layout):

  - ``stem``, ``block1..block4``: post-stage feature maps (B, H, W, C)
  - ``pre_pool``: alias of the last feature map (the LaREx hook point —
    the reference hooks the layer before global pooling)
  - ``penultimate``: pooled features (B, C) feeding the classifier head
    (the feature input for kNN/ViM/ASH/DICE/ReAct)

Use :func:`build_tapped_forward` to get a jitted forward returning only the
taps you need — XLA dead-code-eliminates the rest.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "ResNet",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "SimpleConvNet",
    "build_tapped_forward",
    "space_to_depth_2x2",
    "stem_to_s2d",
]

ModuleDef = Any


def space_to_depth_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C): each 2x2 pixel block becomes one
    position whose channels are ordered (row_parity, col_parity, channel) —
    the layout ``stem_to_s2d``'s regrouped kernel contracts against."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def stem_to_s2d(variables: Dict) -> Dict:
    """Convert a 7x7/s2-stem param tree to the ``s2d_stem=True`` layout.

    The 7x7 kernel zero-pads to 8x8 at the leading row/column (those taps
    fall on positions the original padding never reached) and regroups into
    a (4, 4, 4*C_in, C_out) kernel whose input channels match
    :func:`space_to_depth_2x2`'s (parity-row, parity-col, channel) order.
    Outputs of the converted model are bit-equal to the original up to
    float summation order. Works on trees from ``init`` or
    ``convert_torch_resnet``; every non-stem entry is passed through.
    """
    w = variables["params"]["conv_init"]["kernel"]
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (7, 7), f"expected a 7x7 stem kernel, got {w.shape}"
    w = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w = w.reshape(4, 2, 4, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    w = w.reshape(4, 4, 4 * cin, cout)
    params = dict(variables["params"])
    params["conv_init"] = {**variables["params"]["conv_init"], "kernel": w}
    return {**variables, "params": params}


class ResNetBlock(nn.Module):
    """Basic residual block (two 3x3 convs).

    ``dilation`` > 1 turns the 3x3 convs atrous (same params, larger
    receptive field) — used by dilated backbones (DeepLabv3+ output-stride
    control) where a stage keeps spatial resolution instead of striding.
    """

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        dil = (self.dilation, self.dilation)
        y = self.conv(self.filters, (3, 3), self.strides, kernel_dilation=dil)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), kernel_dilation=dil)(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides, name="conv_proj")(
                residual
            )
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class BottleneckResNetBlock(nn.Module):
    """Bottleneck residual block (1x1 -> 3x3 -> 1x1)."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(
            self.filters, (3, 3), self.strides,
            kernel_dilation=(self.dilation, self.dilation),
        )(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * 4, (1, 1), self.strides, name="conv_proj"
            )(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """ResNet with taps; NHWC; bfloat16-friendly compute dtype.

    ``remat=True`` wraps every residual block in ``jax.checkpoint``
    (rematerialization): block activations are recomputed in the backward
    pass instead of stored, trading ~1 extra forward of FLOPs for O(depth)
    less activation HBM — the standard lever for fitting larger
    batches/models in training. Inference is unaffected.
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_classes: int
    num_filters: int = 64
    cifar_stem: bool = False  # 3x3 stem, no max-pool (CIFAR-sized inputs)
    dtype: Any = jnp.float32
    remat: bool = False
    # Dilated-backbone mode (DeepLabv3+): once the cumulative stride hits
    # ``output_stride``, later stages trade their stride-2 for doubled
    # atrous dilation — same parameters, full-resolution feature maps.
    # None = plain ResNet (cumulative stride 32 / 8 for the cifar stem).
    output_stride: Optional[int] = None
    # False drops the classification head (and its params) — backbone mode
    # for dense-prediction models; returns (None, taps).
    include_head: bool = True
    # Symmetric torch-style conv/pool padding (k//2 each side) instead of
    # XLA "SAME" (which pads asymmetrically for stride 2 on even inputs).
    # Needed for spatial parity when loading torchvision checkpoints via
    # convert_torch_resnet; default off to keep existing goldens.
    torch_padding: bool = False
    # Space-to-depth stem: rearrange the input into 2x2 pixel blocks
    # (H/2, W/2, 4*C) and run an equivalent 4x4/stride-1 conv instead of the
    # 7x7/stride-2 one. Mathematically EXACT (the 7x7 kernel zero-pads to
    # 8x8 and regroups — see stem_to_s2d), but the MXU sees a 192-deep
    # contraction instead of a stride-2 gather over 3 channels, which is
    # the standard TPU ResNet stem optimization. Ignored for cifar_stem.
    # Fresh inits train identically; convert existing params with
    # stem_to_s2d.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.torch_padding:
            def conv(features, kernel_size=(1, 1), strides=(1, 1), **kw):
                dil = kw.get("kernel_dilation", (1, 1))
                kw.setdefault(
                    "padding",
                    [(d * (k // 2), d * (k // 2))
                     for k, d in zip(kernel_size, dil)],
                )
                return nn.Conv(features, kernel_size, strides, use_bias=False,
                               dtype=self.dtype, **kw)
        else:
            conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        taps: Dict[str, jnp.ndarray] = {}

        if self.cifar_stem:
            x = conv(self.num_filters, (3, 3), name="conv_init")(x)
            x = norm(name="bn_init")(x)
            x = nn.relu(x)
        elif self.s2d_stem:
            x = space_to_depth_2x2(x)
            # Equivalent receptive field/stride as the 7x7/s2 conv: padded
            # kernel rows 0..7 = 2*u_off + parity with u_off in [-2, 1],
            # hence kernel 4 with (2, 1) padding on the half-res input.
            x = conv(self.num_filters, (4, 4), (1, 1),
                     padding=[(2, 1), (2, 1)], name="conv_init")(x)
            x = norm(name="bn_init")(x)
            x = nn.relu(x)
            pool_pad = ((1, 1), (1, 1)) if self.torch_padding else "SAME"
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pool_pad)
        else:
            x = conv(self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                     name="conv_init")(x)
            x = norm(name="bn_init")(x)
            x = nn.relu(x)
            pool_pad = ((1, 1), (1, 1)) if self.torch_padding else "SAME"
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pool_pad)
        taps["stem"] = x

        block_cls = nn.remat(self.block_cls) if self.remat else self.block_cls
        cum_stride = 1 if self.cifar_stem else 4
        dilation = 1
        for i, block_size in enumerate(self.stage_sizes):
            for j in range(block_size):
                strides = (1, 1)
                blk_dilation = dilation
                if i > 0 and j == 0:
                    if (
                        self.output_stride is not None
                        and cum_stride >= self.output_stride
                    ):
                        # Keep resolution, grow receptive field. torchvision
                        # convention: the stage's first block runs at the
                        # previous dilation, later blocks at the doubled one.
                        dilation *= 2
                    else:
                        strides = (2, 2)
                        cum_stride *= 2
                # Explicit names keep the param tree identical whether or not
                # blocks are remat-wrapped (nn.remat changes auto-names).
                x = block_cls(
                    self.num_filters * 2**i, strides=strides, conv=conv,
                    norm=norm, dilation=blk_dilation,
                    name=f"stage{i + 1}_block{j}",
                )(x)
            taps[f"block{i + 1}"] = x

        taps["pre_pool"] = x
        x = jnp.mean(x, axis=(1, 2))
        taps["penultimate"] = x
        if not self.include_head:
            return None, taps
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return logits, taps


ResNet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=ResNetBlock)
ResNet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=ResNetBlock)
ResNet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BottleneckResNetBlock)


class SimpleConvNet(nn.Module):
    """Two-conv classifier mirroring the reference's MNIST test fixture
    (reference tests/tests_architecture.py:5-22) with taps."""

    num_classes: int = 10
    features: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps: Dict[str, jnp.ndarray] = {}
        x = nn.relu(nn.Conv(self.features, (3, 3))(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(self.features * 2, (3, 3))(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        taps["pre_pool"] = x
        x = jnp.mean(x, axis=(1, 2))
        taps["penultimate"] = x
        logits = nn.Dense(self.num_classes, name="head")(x)
        return logits, taps


def build_tapped_forward(
    model: nn.Module,
    variables: Dict,
    taps: Sequence[str] = ("pre_pool",),
    channel_first_taps: bool = False,
) -> Callable:
    """Jitted forward returning (logits, {tap: array}).

    Only the requested taps survive (XLA removes the rest). With
    ``channel_first_taps`` 4-D taps are transposed to NCHW for code written
    against the reference's torch layout.
    """

    wanted = tuple(taps)

    # Variables enter the jitted program as an argument, not a closure
    # capture — a closed-over param tree is lowered into the executable as
    # HLO constants, bloating every compile that uses the forward standalone.
    @jax.jit
    def forward(variables, images):
        logits, all_taps = model.apply(variables, images, train=False)
        out = {}
        for name in wanted:
            t = all_taps[name]
            if channel_first_taps and t.ndim == 4:
                t = jnp.transpose(t, (0, 3, 1, 2))
            out[name] = t
        return logits, out

    return lambda images: forward(variables, images)
