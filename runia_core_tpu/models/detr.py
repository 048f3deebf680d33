"""DETR (DEtection TRansformer) in flax, with an HF-checkpoint converter.

The reference consumes DETR-family detectors as external torch models via
output adapters (reference runia_core/feature_extraction/abstract_classes.py:
410-518 drives HF ``*ForObjectDetection`` checkpoints through hooks); this
module makes the same checkpoints TPU-native: :func:`convert_hf_detr` maps a
``transformers.DetrForObjectDetection`` state dict onto a flax DETR whose
eval forward matches torch logits/boxes (parity pinned by
tests/test_detr_convert.py), and :class:`DetrJaxAdapter` exposes the
``DetectionResult`` protocol so the whole object-level OoD stack (ROIAlign
features -> per-detection scoring -> OSOD eval) runs on the converted model
with no torch in the loop.

Architecture (post-LN DETR, Carion et al. 2020):
  backbone (our flax ResNet, include_head=False) -> 1x1 input projection ->
  sine position embeddings -> 6-layer encoder (pos added to q,k each layer)
  -> 6-layer decoder (learned query pos on q,k of self-attn; cross-attn
  queries carry query-pos, keys carry spatial pos, values are raw) ->
  shared-final-LN -> class head (num_labels + no-object column) + 3-layer
  sigmoid box MLP predicting normalized (cx, cy, w, h).

Taps: ``backbone_fmap`` (B, H', W', C) backbone feature map (the RoI source,
what the reference hooks), ``encoder_tokens`` (B, H', W', d) encoder memory
as a grid, ``decoder_queries`` (B, Q, d) final decoder embeddings (the
per-detection feature the reference's DETR adapter extracts).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from runia_core_tpu.extraction.adapters import DetectionResult

__all__ = ["DETR", "DetrJaxAdapter", "convert_hf_detr", "sine_position_embedding"]


def sine_position_embedding(
    h: int, w: int, d_model: int, temperature: float = 10000.0
) -> jnp.ndarray:
    """Normalized 2-D sine/cosine position embedding, (h*w, d_model).

    The DETR variant (normalize=True, scale=2*pi) over an all-valid pixel
    mask: row/column indices are 1-based cumulative sums scaled to
    (0, 2*pi]. Channel layout is [y-embedding | x-embedding], each
    interleaved sin/cos over a shared temperature ladder.
    """
    dim = d_model // 2
    scale = 2 * math.pi
    ts = temperature ** (2 * (jnp.arange(dim) // 2) / dim)

    def embed(coords):
        ang = coords[:, None] / ts[None, :]
        # even channels sin, odd channels cos (pair k shares ts[2k]=ts[2k+1])
        even = jnp.sin(ang[:, 0::2])
        odd = jnp.cos(ang[:, 1::2])
        return jnp.stack([even, odd], axis=-1).reshape(coords.shape[0], dim)

    y = embed(jnp.arange(1, h + 1, dtype=jnp.float32) / (h + 1e-6) * scale)
    x = embed(jnp.arange(1, w + 1, dtype=jnp.float32) / (w + 1e-6) * scale)
    grid = jnp.concatenate(
        [
            jnp.broadcast_to(y[:, None, :], (h, w, dim)),
            jnp.broadcast_to(x[None, :, :], (h, w, dim)),
        ],
        axis=-1,
    )
    return grid.reshape(h * w, d_model)


class DetrAttention(nn.Module):
    """Multi-head attention with DETR's position-embedding convention:
    positions are added to queries/keys BEFORE projection; values always
    come from the raw (position-free) stream."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, queries, q_pos, keys, k_pos, values):
        hd = self.d_model // self.num_heads
        q_in = queries if q_pos is None else queries + q_pos
        k_in = keys if k_pos is None else keys + k_pos
        q = nn.Dense(self.d_model, name="q_proj")(q_in) * (hd ** -0.5)
        k = nn.Dense(self.d_model, name="k_proj")(k_in)
        v = nn.Dense(self.d_model, name="v_proj")(values)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, hd)

        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)), axis=-1
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v))
        out = out.reshape(queries.shape[0], queries.shape[1], self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(out)


class DetrEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, pos):
        h = DetrAttention(self.d_model, self.num_heads, name="self_attn")(
            x, pos, x, pos, x
        )
        x = nn.LayerNorm(epsilon=self.ln_eps, name="self_attn_layer_norm")(x + h)
        h = nn.relu(nn.Dense(self.ffn_dim, name="fc1")(x))
        h = nn.Dense(self.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=self.ln_eps, name="final_layer_norm")(x + h)


class DetrDecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, query_pos, memory, mem_pos):
        h = DetrAttention(self.d_model, self.num_heads, name="self_attn")(
            x, query_pos, x, query_pos, x
        )
        x = nn.LayerNorm(epsilon=self.ln_eps, name="self_attn_layer_norm")(x + h)
        h = DetrAttention(self.d_model, self.num_heads, name="encoder_attn")(
            x, query_pos, memory, mem_pos, memory
        )
        x = nn.LayerNorm(epsilon=self.ln_eps, name="encoder_attn_layer_norm")(x + h)
        h = nn.relu(nn.Dense(self.ffn_dim, name="fc1")(x))
        h = nn.Dense(self.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=self.ln_eps, name="final_layer_norm")(x + h)


class DETR(nn.Module):
    """Post-LN DETR over an NHWC backbone. Returns (outputs, taps) with
    ``outputs = {"logits": (B, Q, num_labels+1), "pred_boxes": (B, Q, 4)}``
    (normalized cxcywh, sigmoid)."""

    backbone: nn.Module  # e.g. ResNet(include_head=False)
    num_labels: int
    num_queries: int = 100
    d_model: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 2048
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, images, train: bool = False):
        _, btaps = self.backbone(images, train=train)
        fmap = btaps["pre_pool"]  # (B, H', W', C)
        b, h, w, _ = fmap.shape

        proj = nn.Conv(self.d_model, (1, 1), name="input_projection")(fmap)
        src = proj.reshape(b, h * w, self.d_model)
        pos = sine_position_embedding(h, w, self.d_model)[None].astype(src.dtype)

        x = src
        for i in range(self.num_encoder_layers):
            x = DetrEncoderLayer(
                self.d_model, self.num_heads, self.ffn_dim, self.ln_eps,
                name=f"encoder_layer{i}",
            )(x, pos)
        memory = x

        query_pos = self.param(
            "query_position_embeddings",
            nn.initializers.normal(1.0),
            (self.num_queries, self.d_model),
        )[None].astype(src.dtype)
        q = jnp.zeros((b, self.num_queries, self.d_model), src.dtype)
        for i in range(self.num_decoder_layers):
            q = DetrDecoderLayer(
                self.d_model, self.num_heads, self.ffn_dim, self.ln_eps,
                name=f"decoder_layer{i}",
            )(q, query_pos, memory, pos)
        q = nn.LayerNorm(epsilon=self.ln_eps, name="decoder_norm")(q)

        logits = nn.Dense(self.num_labels + 1, name="class_labels_classifier")(q)
        bx = q
        for k in range(2):
            bx = nn.relu(nn.Dense(self.d_model, name=f"bbox_mlp{k}")(bx))
        boxes = jax.nn.sigmoid(nn.Dense(4, name="bbox_mlp2")(bx))

        taps = dict(btaps)
        taps["backbone_fmap"] = fmap
        taps["encoder_tokens"] = memory.reshape(b, h, w, self.d_model)
        taps["decoder_queries"] = q
        return {"logits": logits, "pred_boxes": boxes}, taps


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def _np_t(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _lin(sd, prefix) -> Dict[str, np.ndarray]:
    return {"kernel": _np_t(sd[f"{prefix}.weight"]).T,
            "bias": _np_t(sd[f"{prefix}.bias"])}


def _attn(sd, prefix) -> Dict[str, Any]:
    return {name: _lin(sd, f"{prefix}.{name}")
            for name in ("q_proj", "k_proj", "v_proj", "out_proj")}


def _ln(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np_t(sd[f"{prefix}.weight"]),
            "bias": _np_t(sd[f"{prefix}.bias"])}


def _conv_k(t) -> np.ndarray:
    """torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return _np_t(t).transpose(2, 3, 1, 0)


def _bn_pair(sd, prefix) -> Tuple[Dict, Dict]:
    return (
        {"scale": _np_t(sd[f"{prefix}.weight"]),
         "bias": _np_t(sd[f"{prefix}.bias"])},
        {"mean": _np_t(sd[f"{prefix}.running_mean"]),
         "var": _np_t(sd[f"{prefix}.running_var"])},
    )


def _convert_hf_native_resnet(sd, prefix: str, backbone_cfg):
    """HF-native ResNet backbone (transformers ResNetBackbone key layout,
    ``embedder.embedder.*`` / ``encoder.stages.{s}.layers.{j}.layer.{c}.*``)
    -> (flax ResNet, params, batch_stats)."""
    from runia_core_tpu.models.resnet import (
        BottleneckResNetBlock,
        ResNet,
        ResNetBlock,
    )

    bottleneck = backbone_cfg.layer_type == "bottleneck"
    block_cls = BottleneckResNetBlock if bottleneck else ResNetBlock
    num_filters = int(backbone_cfg.embedding_size)
    mult = 4 if bottleneck else 1
    expected = [num_filters * (2 ** i) * mult
                for i in range(len(backbone_cfg.depths))]
    if list(backbone_cfg.hidden_sizes) != expected:
        raise NotImplementedError(
            "convert_hf_detr supports doubling-width ResNet backbones "
            f"(hidden_sizes {expected}); got {list(backbone_cfg.hidden_sizes)}"
        )
    if getattr(backbone_cfg, "downsample_in_bottleneck", False):
        raise NotImplementedError("stride-on-1x1 bottleneck variant")

    model = ResNet(
        stage_sizes=tuple(backbone_cfg.depths), block_cls=block_cls,
        num_classes=1, num_filters=num_filters, include_head=False,
        torch_padding=True,
    )
    n_convs = 3 if bottleneck else 2
    params: Dict[str, Any] = {
        "conv_init": {"kernel": _conv_k(sd[f"{prefix}.embedder.embedder.convolution.weight"])}
    }
    stats: Dict[str, Any] = {}
    params["bn_init"], stats["bn_init"] = _bn_pair(
        sd, f"{prefix}.embedder.embedder.normalization"
    )
    for s, depth in enumerate(backbone_cfg.depths):
        for j in range(depth):
            src = f"{prefix}.encoder.stages.{s}.layers.{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = {
                    "kernel": _conv_k(sd[f"{src}.layer.{c}.convolution.weight"])
                }
                bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"] = _bn_pair(
                    sd, f"{src}.layer.{c}.normalization"
                )
            if f"{src}.shortcut.convolution.weight" in sd:
                bp["conv_proj"] = {
                    "kernel": _conv_k(sd[f"{src}.shortcut.convolution.weight"])
                }
                bp["norm_proj"], bs["norm_proj"] = _bn_pair(
                    sd, f"{src}.shortcut.normalization"
                )
            params[f"stage{s + 1}_block{j}"] = bp
            stats[f"stage{s + 1}_block{j}"] = bs
    return model, params, stats


def convert_hf_detr(hf_model) -> Tuple[DETR, Dict]:
    """Convert ``transformers.DetrForObjectDetection`` to (DETR, variables).

    Requires the HF-native ResNet backbone (``use_timm_backbone=False``,
    the layout public DETR checkpoints re-export to); timm-layout backbones
    raise. Eval-mode parity vs torch is pinned by tests/test_detr_convert.py.
    """
    cfg = hf_model.config
    if getattr(cfg, "use_timm_backbone", False):
        raise NotImplementedError(
            "timm-backbone DETR checkpoints: reload with use_timm_backbone="
            "False (HF-native ResNet) before converting"
        )
    # Configs that change the forward without changing any param shape —
    # they would load cleanly and produce silently wrong outputs, so raise
    # (the converter contract in docs/CONVERTERS.md).
    if getattr(cfg, "decoder_attention_heads", cfg.encoder_attention_heads) \
            != cfg.encoder_attention_heads:
        raise NotImplementedError(
            "DETR with decoder_attention_heads != encoder_attention_heads"
        )
    if cfg.decoder_ffn_dim != cfg.encoder_ffn_dim:
        raise NotImplementedError(
            "DETR with decoder_ffn_dim != encoder_ffn_dim"
        )
    if getattr(cfg.backbone_config, "downsample_in_first_stage", False):
        raise NotImplementedError(
            "DETR backbone with downsample_in_first_stage=True"
        )
    sd = {k: v for k, v in hf_model.state_dict().items()}

    backbone, b_params, b_stats = _convert_hf_native_resnet(
        sd, "model.backbone.conv_encoder.model", cfg.backbone_config
    )
    model = DETR(
        backbone=backbone,
        num_labels=cfg.num_labels,
        num_queries=cfg.num_queries,
        d_model=cfg.d_model,
        num_heads=cfg.encoder_attention_heads,
        num_encoder_layers=cfg.encoder_layers,
        num_decoder_layers=cfg.decoder_layers,
        ffn_dim=cfg.encoder_ffn_dim,
    )

    params: Dict[str, Any] = {
        "backbone": b_params,
        "input_projection": {
            "kernel": _conv_k(sd["model.input_projection.weight"]),
            "bias": _np_t(sd["model.input_projection.bias"]),
        },
        "query_position_embeddings": _np_t(
            sd["model.query_position_embeddings.weight"]
        ),
        "decoder_norm": _ln(sd, "model.decoder.layernorm"),
        "class_labels_classifier": _lin(sd, "class_labels_classifier"),
        "bbox_mlp0": _lin(sd, "bbox_predictor.layers.0"),
        "bbox_mlp1": _lin(sd, "bbox_predictor.layers.1"),
        "bbox_mlp2": _lin(sd, "bbox_predictor.layers.2"),
    }
    for i in range(cfg.encoder_layers):
        src = f"model.encoder.layers.{i}"
        params[f"encoder_layer{i}"] = {
            "self_attn": _attn(sd, f"{src}.self_attn"),
            "self_attn_layer_norm": _ln(sd, f"{src}.self_attn_layer_norm"),
            "fc1": _lin(sd, f"{src}.fc1"),
            "fc2": _lin(sd, f"{src}.fc2"),
            "final_layer_norm": _ln(sd, f"{src}.final_layer_norm"),
        }
    for i in range(cfg.decoder_layers):
        src = f"model.decoder.layers.{i}"
        params[f"decoder_layer{i}"] = {
            "self_attn": _attn(sd, f"{src}.self_attn"),
            "self_attn_layer_norm": _ln(sd, f"{src}.self_attn_layer_norm"),
            "encoder_attn": _attn(sd, f"{src}.encoder_attn"),
            "encoder_attn_layer_norm": _ln(sd, f"{src}.encoder_attn_layer_norm"),
            "fc1": _lin(sd, f"{src}.fc1"),
            "fc2": _lin(sd, f"{src}.fc2"),
            "final_layer_norm": _ln(sd, f"{src}.final_layer_norm"),
        }

    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(
            jnp.asarray, {"backbone": b_stats}
        ),
    }
    return model, variables


# ---------------------------------------------------------------------------
# DetectionResult adapter (drop-in for HFDetrAdapter, torch-free)
# ---------------------------------------------------------------------------


class DetrJaxAdapter:
    """``adapter(image, predict_conf) -> DetectionResult`` over a flax DETR.

    Scoring follows the reference's classic-DETR postprocess (softmax over
    classes incl. the trailing no-object column, which is then dropped —
    reference abstract_classes.py:503-518 / HFDetrAdapter): per-query class
    scores, confidence threshold, cxcywh -> absolute xyxy boxes. The
    ``fmaps`` slot carries the backbone feature map (NCHW) for RoI pooling,
    ``features`` the decoder query embeddings.
    """

    def __init__(self, model: DETR, variables: Dict):
        self.model = model
        self.variables = variables
        self._forward = jax.jit(
            lambda imgs: model.apply(variables, imgs, train=False)
        )

    def __call__(self, image, predict_conf: float = 0.25, **kw) -> DetectionResult:
        x = np.asarray(image, np.float32)
        if x.ndim == 3:  # HWC -> NHWC
            x = x[None]
        img_h, img_w = int(x.shape[1]), int(x.shape[2])
        outputs, taps = self._forward(jnp.asarray(x))

        logits = np.asarray(outputs["logits"][0])  # (Q, num_labels + 1)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = (probs / probs.sum(-1, keepdims=True))[:, :-1]
        scores = probs.max(-1)
        classes = probs.argmax(-1)
        keep = scores > predict_conf

        cxcywh = np.asarray(outputs["pred_boxes"][0])
        cx, cy, bw, bh = cxcywh.T
        boxes = np.stack(
            [(cx - bw / 2) * img_w, (cy - bh / 2) * img_h,
             (cx + bw / 2) * img_w, (cy + bh / 2) * img_h], axis=-1
        ).astype(np.float32)[keep]

        fmap = np.transpose(np.asarray(taps["backbone_fmap"]), (0, 3, 1, 2))
        return DetectionResult(
            boxes=boxes,
            img_shape=(img_h, img_w),
            scores=scores[keep],
            classes=classes[keep].astype(np.int64),
            logits=logits[keep, :-1],
            features=np.asarray(taps["decoder_queries"][0])[keep],
            fmaps=[fmap],
        )
