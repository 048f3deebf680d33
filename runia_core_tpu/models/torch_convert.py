"""Load torchvision-layout ResNet checkpoints onto the flax ResNet.

Reference users carry torch classifier checkpoints (the reference hooks
user-supplied torchvision/detectron2 models — runia_core/README.md usage);
``convert_torch_resnet`` maps a torchvision ``state_dict`` (resnet18/34/50
key layout: ``conv1.*``, ``bn1.*``, ``layer{i}.{j}.*``, ``fc.*``) onto
(ResNet, variables) so those weights run the TPU LaREx pipeline. The
returned model uses ``torch_padding=True`` for exact spatial parity with
torch's symmetric conv/pool padding (XLA "SAME" pads stride-2 convs
asymmetrically). Forward parity vs an eval-mode torch ResNet is pinned by
tests/test_torch_convert.py.

No torchvision import is needed — the input is a plain mapping of
name -> tensor/ndarray, e.g. ``torch.load(path, map_location="cpu")`` or a
``model.state_dict()``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from runia_core_tpu.models.resnet import ResNet, ResNetBlock, BottleneckResNetBlock

__all__ = ["convert_torch_resnet", "convert_hf_vit"]

_ARCHS = {
    "resnet18": ((2, 2, 2, 2), ResNetBlock),
    "resnet34": ((3, 4, 6, 3), ResNetBlock),
    "resnet50": ((3, 4, 6, 3), BottleneckResNetBlock),
}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(t) -> np.ndarray:
    """torch conv weight (out, in, kh, kw) -> flax kernel (kh, kw, in, out)."""
    return _np(t).transpose(2, 3, 1, 0)


def _bn(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    return (
        {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]),
         "var": _np(sd[f"{prefix}.running_var"])},
    )


def _infer_arch(sd: Mapping) -> str:
    if "layer1.0.conv3.weight" in sd:
        return "resnet50"
    return "resnet34" if "layer2.3.conv1.weight" in sd else "resnet18"


def convert_torch_resnet(
    state_dict: Mapping[str, Any],
    arch: str | None = None,
    dtype=None,
):
    """(state_dict, arch) -> (ResNet model, {"params", "batch_stats"}).

    ``arch`` is inferred from the key layout when omitted. Keys with a
    ``module.``/``model.`` prefix (DataParallel / lightning dumps) are
    accepted. BatchNorm running stats land in ``batch_stats`` — run the
    model with ``train=False`` (the default) for eval-mode parity.
    """
    sd = {
        k.removeprefix("module.").removeprefix("model."): v
        for k, v in state_dict.items()
    }
    arch = arch or _infer_arch(sd)
    if arch not in _ARCHS:
        raise ValueError(f"unknown arch {arch!r}; expected one of {sorted(_ARCHS)}")
    stage_sizes, block_cls = _ARCHS[arch]
    num_classes = _np(sd["fc.weight"]).shape[0]
    num_filters = _np(sd["conv1.weight"]).shape[0]
    kwargs: Dict[str, Any] = dict(
        stage_sizes=stage_sizes, block_cls=block_cls, num_classes=num_classes,
        num_filters=num_filters, torch_padding=True,
    )
    if dtype is not None:
        kwargs["dtype"] = dtype
    model = ResNet(**kwargs)

    params: Dict[str, Any] = {"conv_init": {"kernel": _conv(sd["conv1.weight"])}}
    stats: Dict[str, Any] = {}
    params["bn_init"], stats["bn_init"] = _bn(sd, "bn1")

    n_convs = 3 if block_cls is BottleneckResNetBlock else 2
    for i, size in enumerate(stage_sizes):
        for j in range(size):
            src = f"layer{i + 1}.{j}"
            dst = f"stage{i + 1}_block{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = {"kernel": _conv(sd[f"{src}.conv{c + 1}.weight"])}
                bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"] = _bn(
                    sd, f"{src}.bn{c + 1}"
                )
            if f"{src}.downsample.0.weight" in sd:
                bp["conv_proj"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])
                }
                bp["norm_proj"], bs["norm_proj"] = _bn(sd, f"{src}.downsample.1")
            params[dst] = bp
            stats[dst] = bs

    params["head"] = {
        "kernel": _np(sd["fc.weight"]).T,
        "bias": _np(sd["fc.bias"]),
    }
    return model, {"params": params, "batch_stats": stats}


def _linear(w, h: int | None = None):
    """torch Linear weight (out, in) -> flax kernel (in, out); optionally
    split the out dim into (heads, head_dim) for flax MHA kernels."""
    k = _np(w).T
    if h is not None:
        return k.reshape(k.shape[0], h, k.shape[1] // h)
    return k


def convert_hf_vit(hf_model) -> Tuple["ViT", Dict]:
    """Convert a ``transformers`` ViT classifier to (ViT, variables).

    Accepts ``ViTForImageClassification`` (or any model exposing the same
    ``vit.*``/``classifier`` state-dict layout). Returns the CLS-token,
    exact-GELU configuration matching the HF forward; parity vs the
    eval-mode torch model is pinned by tests/test_torch_convert.py.

    The reference consumes HF vision checkpoints through torch hooks
    (reference feature_extraction/abstract_classes.py:104-246); this is the
    conversion path that lets those checkpoints run the TPU pipeline
    natively.
    """
    from runia_core_tpu.models.vit import ViT

    cfg = hf_model.config
    sd = {k: v for k, v in hf_model.state_dict().items()}
    heads = cfg.num_attention_heads

    model = ViT(
        num_classes=getattr(cfg, "num_labels", None) or sd["classifier.weight"].shape[0],
        patch_size=cfg.patch_size,
        d_model=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=heads,
        use_cls_token=True,
        pool="cls",
        exact_gelu=True,
        ln_eps=float(getattr(cfg, "layer_norm_eps", 1e-12)),
    )

    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv(sd["vit.embeddings.patch_embeddings.projection.weight"]),
            "bias": _np(sd["vit.embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": _np(sd["vit.embeddings.cls_token"]),
        "pos_embed": _np(sd["vit.embeddings.position_embeddings"]),
        "encoder_norm": {
            "scale": _np(sd["vit.layernorm.weight"]),
            "bias": _np(sd["vit.layernorm.bias"]),
        },
        "head": {
            "kernel": _linear(sd["classifier.weight"]),
            "bias": _np(sd["classifier.bias"]),
        },
    }

    for i in range(cfg.num_hidden_layers):
        pre = f"vit.encoder.layer.{i}"
        attn = f"{pre}.attention"
        head_dim = cfg.hidden_size // heads
        params[f"block_{i}"] = {
            "LayerNorm_0": {
                "scale": _np(sd[f"{pre}.layernorm_before.weight"]),
                "bias": _np(sd[f"{pre}.layernorm_before.bias"]),
            },
            "MultiHeadDotProductAttention_0": {
                **{
                    name: {
                        "kernel": _linear(
                            sd[f"{attn}.attention.{name}.weight"], heads
                        ),
                        "bias": _np(
                            sd[f"{attn}.attention.{name}.bias"]
                        ).reshape(heads, head_dim),
                    }
                    for name in ("query", "key", "value")
                },
                "out": {
                    # (out, in=H*hd) -> transpose -> (H, hd, out)
                    "kernel": _linear(sd[f"{attn}.output.dense.weight"]).reshape(
                        heads, head_dim, cfg.hidden_size
                    ),
                    "bias": _np(sd[f"{attn}.output.dense.bias"]),
                },
            },
            "LayerNorm_1": {
                "scale": _np(sd[f"{pre}.layernorm_after.weight"]),
                "bias": _np(sd[f"{pre}.layernorm_after.bias"]),
            },
            "Dense_0": {
                "kernel": _linear(sd[f"{pre}.intermediate.dense.weight"]),
                "bias": _np(sd[f"{pre}.intermediate.dense.bias"]),
            },
            "Dense_1": {
                "kernel": _linear(sd[f"{pre}.output.dense.weight"]),
                "bias": _np(sd[f"{pre}.output.dense.bias"]),
            },
        }

    import jax  # deferred: keep module importable torch-free
    import jax.numpy as jnp

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    return model, variables
