"""RCNN (detectron2-style) adapter helpers.

TPU-native equivalents of reference runia_core/rcnn.py. The reference relies
on a documented forward-patch of the RPN head storing intermediates in a
module-global list (rcnn.py:159-172) plus a module-global DropBlock instance
flagged "Very bad practice" (rcnn.py:27-28). Here the adapted RCNN is a pure
callable following a small output protocol, and all sampling is explicit-RNG
JAX — no shared mutable state.

Adapted-model protocol::

    model(image, key=None) -> RCNNOutput(
        scores,          # (N,) post-NMS detection scores (softmax probs)
        inter_feat,      # (N, C+1) logits of NMS survivors (background last)
        box_cls,         # (1000, C+1) raw proposal logits before NMS
        latent,          # hooked layer output (see layer_type)
        rpn_feats,       # list of (1, C, H, W) RPN intermediate maps
        backbone_feats,  # dict of pyramid level -> (1, C, H, W)
    )

``key`` enables stochastic (MC-dropout) forwards where supported.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.detectors.base import record_time
from runia_core_tpu.evaluation.entropy import get_dl_h_z
from runia_core_tpu.inference.image_level import LaRDInference, LaRExInference
from runia_core_tpu.ops.dropblock import dropblock2d
from runia_core_tpu.reduction import apply_pca_transform

__all__ = [
    "RCNNOutput",
    "get_msp_score_rcnn",
    "get_dice_feat_mean_react_percentile_rcnn",
    "get_energy_score_rcnn",
    "get_ls_mcd_samples_rcnn",
    "MCSamplerRCNN",
    "LaRexInferenceRCNN",
    "LaRDInferenceRCNN",
    "remove_background_dimension",
]


@dataclass
class RCNNOutput:
    scores: Optional[np.ndarray] = None
    inter_feat: Optional[np.ndarray] = None
    box_cls: Optional[np.ndarray] = None
    latent: Any = None
    rpn_feats: List[Any] = field(default_factory=list)
    backbone_feats: Dict[str, Any] = field(default_factory=dict)
    extra: Dict[str, Any] = field(default_factory=dict)


def get_msp_score_rcnn(dnn_model: Callable, input_dataloader: Iterable) -> np.ndarray:
    """Per-image max softmax score; 0.0 for images with no detections
    (reference rcnn.py:42-76)."""
    scores = []
    for image in input_dataloader:
        out: RCNNOutput = dnn_model(image)
        pred_scores = np.asarray(out.scores) if out.scores is not None else np.zeros(0)
        scores.append(float(pred_scores.max()) if pred_scores.size else 0.0)
    return np.asarray(scores)


def get_dice_feat_mean_react_percentile_rcnn(
    dnn_model: Callable, ind_dataloader: Iterable, react_percentile: int = 90
) -> Tuple[np.ndarray, float]:
    """DICE mean-activation vector + ReAct clipping percentile from
    proposal-mean features (reference rcnn.py:79-106). The adapted model must
    return per-proposal penultimate features from ``model(image).latent``."""
    assert 0 < react_percentile < 100, (
        "react_percentile must be greater than 0 and less than 100"
    )
    feat_log = []
    for inputs in ind_dataloader:
        out: RCNNOutput = dnn_model(inputs)
        feats = np.asarray(out.latent)
        feat_log.append(feats.mean(0).reshape(1, -1))
    feat_log_array = np.array(feat_log).squeeze()
    return feat_log_array.mean(0), float(
        np.percentile(feat_log_array, react_percentile)
    )


def get_energy_score_rcnn(dnn_model: Callable, input_dataloader: Iterable):
    """Per-image mean energy from raw proposals and from NMS survivors,
    background column stripped (reference rcnn.py:109-141)."""
    raw_scores, filtered_scores = [], []
    for image in input_dataloader:
        out: RCNNOutput = dnn_model(image)
        box_cls = jnp.asarray(np.asarray(out.box_cls))
        inter = jnp.asarray(np.asarray(out.inter_feat))
        raw = jax.scipy.special.logsumexp(box_cls[:, :-1], axis=1)
        filt = jax.scipy.special.logsumexp(inter[:, :-1], axis=1)
        raw_scores.append(float(jnp.mean(raw)))
        filtered_scores.append(float(jnp.mean(filt)))
    return np.asarray(raw_scores), np.asarray(filtered_scores)


class MCSamplerRCNN:
    """MC-DropBlock sampler over RPN intermediate maps
    (reference rcnn.py:280-332: block_size=8, drop_prob=0.5 per sample).

    Callable on a list of (1, C_l, H_l, W_l) RPN feature maps; each MC sample
    DropBlocks every level, reduces to per-channel means, and concatenates
    levels -> (S, sum_l C_l).
    """

    def __init__(self, mc_samples: int = 8, layer_type: str = "RPN",
                 block_size: int = 8, drop_prob: float = 0.5):
        assert layer_type == "RPN", "layer_type must be 'RPN'"
        self.mc_samples = mc_samples
        self.block_size = block_size
        self.drop_prob = drop_prob
        self._base_key = jax.random.key(0)
        self._counter = 0

    def __call__(self, rpn_feats: List[Any], key: Optional[jax.Array] = None) -> jnp.ndarray:
        if key is None:
            key = jax.random.fold_in(self._base_key, self._counter)
            self._counter += 1
        feats = [jnp.asarray(np.asarray(f)) for f in rpn_feats]

        def one_sample(k):
            parts = []
            for i, fmap in enumerate(feats):
                noised = dropblock2d(
                    jax.random.fold_in(k, i), fmap, self.drop_prob, self.block_size,
                    channel_axis=1,
                )
                parts.append(jnp.mean(noised, axis=(2, 3)).reshape(-1))
            return jnp.concatenate(parts)

        keys = jax.random.split(key, self.mc_samples)
        return jnp.stack([one_sample(k) for k in keys])

    # torch-API shims
    def to(self, device):
        return self

    def train(self, mode: bool = True):
        return self


def _reduce_rpn(feats: List[Any]) -> np.ndarray:
    """Per-level channel means concatenated (reference rcnn.py:216-225)."""
    parts = [
        np.asarray(jnp.mean(jnp.asarray(np.asarray(f)), axis=(2, 3))).reshape(-1)
        for f in feats
    ]
    return np.concatenate(parts)


def get_ls_mcd_samples_rcnn(
    model: Callable,
    data_loader: Iterable,
    mcd_nro_samples: int,
    hook_dropout_layer: str = "latent",
    layer_type: str = "RPN",
    return_raw_predictions: bool = False,
    rng: Optional[jax.Array] = None,
    dropblock_prob: float = 0.4,
    dropblock_size: int = 1,
):
    """MC-dropout latent samples from an adapted RCNN (reference rcnn.py:145-277).

    The adapted model is called ``model(image, key)`` so stochastic layers
    get explicit RNG; layer_type selects the reduction:
      'Conv': channel means of ``out.latent``;
      'RPN': per-level channel means of ``out.rpn_feats`` concatenated;
      'backbone': DropBlock each pyramid level then channel means (replaces
        the reference's module-global dropblock_ext, rcnn.py:27-28);
      'FC': mean over the proposal feature axis of ``out.latent``; images
        whose proposal count differs from 1000 are skipped, like the
        reference (rcnn.py:244-266).
    """
    assert layer_type in ("FC", "Conv", "RPN", "backbone"), (
        "Layer type must be either 'FC','backbone', 'RPN' or 'Conv'"
    )
    key = rng if rng is not None else jax.random.key(0)
    dl_samples = []
    raw_predictions = []
    for i, image in enumerate(data_loader):
        img_samples = []
        keep_image = True
        for s in range(mcd_nro_samples):
            out: RCNNOutput = model(image, jax.random.fold_in(key, i * 100003 + s))
            if return_raw_predictions:
                inter = np.asarray(out.inter_feat)
                raw_predictions.append(inter[:, :-1].mean(0))
            if layer_type == "Conv":
                latent = jnp.asarray(np.asarray(out.latent))
                sample = np.asarray(jnp.mean(latent, axis=(2, 3))).reshape(-1)
            elif layer_type == "RPN":
                sample = _reduce_rpn(out.rpn_feats)
            elif layer_type == "backbone":
                parts = []
                for j, (k_name, v) in enumerate(out.backbone_feats.items()):
                    noised = dropblock2d(
                        jax.random.fold_in(key, i * 7919 + s * 131 + j),
                        jnp.asarray(np.asarray(v)),
                        dropblock_prob,
                        dropblock_size,
                        channel_axis=1,
                    )
                    parts.append(np.asarray(jnp.mean(noised, axis=(2, 3))).reshape(-1))
                sample = np.concatenate(parts)
            else:  # FC: (n_proposals, d) -> mean over feature axis
                latent = np.asarray(out.latent)
                if latent.shape[0] != 1000:
                    keep_image = False
                    print(f"Omitted image: {i}")
                    break
                sample = latent.mean(1)
            img_samples.append(sample)
        if keep_image:
            if layer_type == "Conv":
                dl_samples.append(np.concatenate([s[None] for s in img_samples], 0))
            else:
                dl_samples.append(np.stack(img_samples, axis=0))
    stacked = np.concatenate(dl_samples, axis=0)
    if return_raw_predictions:
        return stacked, np.stack(raw_predictions, axis=0)
    return stacked


class LaRexInferenceRCNN(LaRExInference):
    """LaREx inference for adapted RCNNs (reference rcnn.py:335-441): the MC
    sampler runs on the RPN intermediate maps returned by the model."""

    def __init__(self, model, postprocessor, drop_block_prob, drop_block_size,
                 mcd_samples_nro, mcd_sampler=MCSamplerRCNN, pca_transform=None,
                 layer_type="RPN", **kwargs):
        self.model = model
        self.postprocessor = postprocessor
        self.drop_block_prob = drop_block_prob
        self.drop_block_size = drop_block_size
        self.mcd_samples_nro = mcd_samples_nro
        self.layer_type = layer_type
        self.pca_transform = pca_transform
        self.mc_sampler = MCSamplerRCNN(
            mc_samples=mcd_samples_nro, block_size=drop_block_size,
            drop_prob=drop_block_prob,
        )

    def get_score(self, input_image, layer_hook=None, key=None):
        out: RCNNOutput = self.model(input_image)
        mc_samples = self.mc_sampler(out.rpn_feats, key)
        _, sample_h_z = get_dl_h_z(np.asarray(mc_samples), self.mcd_samples_nro)
        if self.pca_transform is not None:
            sample_h_z = apply_pca_transform(sample_h_z, self.pca_transform)
        sample_score = self.postprocessor.postprocess(sample_h_z)
        return out, sample_score

    @record_time
    def get_layer_mc_samples(self, input_image, layer_hook=None):
        out: RCNNOutput = self.model(input_image)
        return self.mc_sampler(out.rpn_feats)

    @record_time
    def get_score_full_inference(self, input_image, layer_hook=None, key=None):
        """Slow twin: N full model forwards, one DropBlock each
        (reference rcnn.py:404-441)."""
        key = key if key is not None else jax.random.key(0)
        mc_samples = []
        out = None
        for i in range(self.mcd_samples_nro):
            out = self.model(input_image)
            sample = self.mc_sampler(out.rpn_feats, jax.random.fold_in(key, i))[0]
            mc_samples.append(np.asarray(sample))
        mc_samples = np.stack(mc_samples, axis=0)
        _, sample_h_z = get_dl_h_z(mc_samples, self.mcd_samples_nro)
        if self.pca_transform is not None:
            sample_h_z = apply_pca_transform(sample_h_z, self.pca_transform)
        return out, self.postprocessor.postprocess(sample_h_z)


class LaRDInferenceRCNN(LaRDInference):
    """LaRD inference for adapted RCNNs (reference rcnn.py:444-508)."""

    def __init__(self, model, postprocessor, pca_transform=None, layer_type="Conv"):
        super().__init__(model, postprocessor, pca_transform, layer_type)
        self.layer_type = layer_type

    def get_score(self, input_image, layer_hook=None):
        out: RCNNOutput = self.model(input_image)
        if self.layer_type == "RPN":
            latent_rep = _reduce_rpn(out.rpn_feats).reshape(1, -1)
        else:
            latent_rep = self._reduce(jnp.asarray(np.asarray(out.latent)))
        if self.pca_transform is not None:
            latent_rep = apply_pca_transform(latent_rep, self.pca_transform)
        return out, self.postprocessor.postprocess(np.asarray(latent_rep))


def remove_background_dimension(
    fc_params: Dict,
    ind_data_dict: Dict[str, np.ndarray],
    ood_data_dict: Dict[str, np.ndarray],
    ood_names: List[str],
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Strip the RCNN background column from 21/11-dim logits and fc params
    (reference rcnn.py:511-558)."""
    w = np.asarray(fc_params["weight"])
    b = np.asarray(fc_params["bias"])
    if w.shape[0] == 21 or w.shape[0] == 11:
        w = w[:-1, :]
    if b.shape[0] == 21 or b.shape[0] == 11:
        b = b[:-1]
    fc_params["weight"] = w
    fc_params["bias"] = b
    for split in ("train logits", "valid logits"):
        if ind_data_dict[split].shape[-1] in (21, 11):
            ind_data_dict[split] = ind_data_dict[split][:, :-1]
    for ood_dataset in ood_names:
        if ood_data_dict[f"{ood_dataset} logits"].shape[-1] in (21, 11):
            ood_data_dict[f"{ood_dataset} logits"] = ood_data_dict[
                f"{ood_dataset} logits"
            ][:, :-1]
    return ind_data_dict, ood_data_dict, fc_params
