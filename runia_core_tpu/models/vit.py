"""Vision Transformer classifier with feature taps.

Widens the model zoo beyond CNNs: the reference is model-agnostic via torch
hooks (reference feature_extraction/abstract_classes.py:104-246 hooks any
layer), and this is the tap-based equivalent for ViTs. The LaREx-relevant
tap is ``encoder_tokens`` — the final encoder's patch tokens reshaped to
their (B, h, w, D) grid — so MC-DropBlock applies as *structured token
dropout* on the patch grid and the whole fused LaREx pipeline
(`inference.build_larex_scorer(tap="encoder_tokens", channel_axis=3)`) runs
unchanged on a transformer backbone.

Taps: ``encoder_tokens`` (B, h, w, D) final patch-token grid;
``pre_head`` (B, D) mean-pooled pre-logits feature.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ViT"]


class EncoderBlock(nn.Module):
    num_heads: int
    d_model: int
    # HF/timm ViTs use the exact (erf) GELU; flax defaults to the tanh
    # approximation. Converted checkpoints need the exact form for parity.
    exact_gelu: bool = False
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=self.ln_eps)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=self.ln_eps)(x)
        h = nn.Dense(4 * self.d_model)(h)
        h = nn.gelu(h, approximate=not self.exact_gelu)
        x = x + nn.Dense(self.d_model)(h)
        return x


class ViT(nn.Module):
    """Patch-embed → pre-LN encoder stack → pooled head.

    Default is mean pooling with no CLS token, so every token is a patch and
    the ``encoder_tokens`` tap is always a full (h, w) grid. Set
    ``use_cls_token=True`` (and ``pool="cls"``) for the HF/timm layout —
    :func:`runia_core_tpu.models.convert_hf_vit` builds that configuration
    from a ``transformers`` ViT checkpoint; the CLS token is excluded from
    the ``encoder_tokens`` grid either way.
    """

    num_classes: int
    patch_size: int = 4
    d_model: int = 64
    num_layers: int = 4
    num_heads: int = 4
    use_cls_token: bool = False
    pool: str = "mean"  # "mean" | "cls" (cls requires use_cls_token)
    exact_gelu: bool = False
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, images, train: bool = False) -> Tuple[jnp.ndarray, dict]:
        b, height, width, _ = images.shape
        p = self.patch_size
        assert height % p == 0 and width % p == 0, "image must tile into patches"
        assert self.pool in ("mean", "cls")
        assert not (self.pool == "cls" and not self.use_cls_token)
        h, w = height // p, width // p

        x = nn.Conv(
            self.d_model, kernel_size=(p, p), strides=(p, p), name="patch_embed"
        )(images)  # (B, h, w, D)
        x = x.reshape(b, h * w, self.d_model)
        n_extra = int(self.use_cls_token)
        if self.use_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, self.d_model)
            )
            x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.d_model)), x], 1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, h * w + n_extra, self.d_model),
        )
        x = x + pos
        for i in range(self.num_layers):
            x = EncoderBlock(
                self.num_heads, self.d_model, exact_gelu=self.exact_gelu,
                ln_eps=self.ln_eps, name=f"block_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="encoder_norm")(x)

        patch_tokens = x[:, n_extra:]
        taps = {"encoder_tokens": patch_tokens.reshape(b, h, w, self.d_model)}
        pooled = x[:, 0] if self.pool == "cls" else patch_tokens.mean(axis=1)
        taps["pre_head"] = pooled
        logits = nn.Dense(self.num_classes, name="head")(pooled)
        return logits, taps
