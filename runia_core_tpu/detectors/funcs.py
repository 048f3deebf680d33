"""Score math kernels for the post-hoc OoD detectors (pure JAX/XLA).

TPU-native re-implementations of the reference's math kernels
(reference: runia_core/inference/funcs.py). Everything is batch-first and
jittable: the reference's per-sample loops (e.g. mahalanobis_postprocess,
funcs.py:88-100) become single matmul programs; RouteDICE's ``.cuda()``-bound
masked-linear layer (funcs.py:124-190) becomes a pure (mask, weight) pytree.
"""

from __future__ import annotations

import warnings
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.ops.linalg import (
    class_means,
    classwise_center,
    classwise_mahalanobis_max,
    empirical_precision,
    mvn_fit_cholesky,
    mvn_log_prob,
    shared_class_precision,
)

__all__ = [
    "mahalanobis_preprocess",
    "mahalanobis_postprocess",
    "normalizer",
    "RouteDICE",
    "dice_masked_weight",
    "route_dice_logits",
    "ash_s_linear_layer",
    "ash_s_conv_layer",
    "gmm_fit",
    "gmm_log_prob",
    "generalized_entropy",
    "get_predictive_uncertainty_score",
    "get_mcd_pred_uncertainty_score",
    "get_dice_feat_mean_react_percentile",
    "react_clip_logits",
]

Array = jnp.ndarray
ArrayLike = Union[np.ndarray, jnp.ndarray]


def mahalanobis_preprocess(
    ind_data: Dict[str, ArrayLike], num_classes: int
) -> Tuple[Array, Array]:
    """Class means + shared precision of class-centered data.

    Matches reference funcs.py:33-66: per-class means from "train features" /
    "train labels", then sklearn EmpiricalCovariance (ML, divide-by-n) on the
    pooled class-centered data, returning its pseudo-inverse precision.
    """
    x = jnp.asarray(ind_data["train features"])
    labels = jnp.asarray(ind_data["train labels"])
    return shared_class_precision(x, labels, num_classes, warn_label="train class")


def mahalanobis_postprocess(
    feats: ArrayLike, class_mean: ArrayLike, precision: ArrayLike, num_classes: int
) -> np.ndarray:
    """Per-sample max-over-classes negative Mahalanobis quadratic form.

    Batched equivalent of the reference's per-sample loop (funcs.py:88-100);
    NaN class scores (empty classes) are mapped to -inf before the max
    (funcs.py:95).
    """
    del num_classes  # class count comes from class_mean's leading axis
    scores = classwise_mahalanobis_max(
        jnp.asarray(feats), jnp.asarray(class_mean), jnp.asarray(precision)
    )
    return np.asarray(scores)


def normalizer(x: ArrayLike) -> ArrayLike:
    """Row-wise L2 normalization with the reference's 1e-10 guard (funcs.py:105-115)."""
    if isinstance(x, np.ndarray):
        return x / (np.linalg.norm(x, ord=2, axis=-1, keepdims=True) + 1e-10)
    return x / (jnp.linalg.norm(x, ord=2, axis=-1, keepdims=True) + 1e-10)


# ---------------------------------------------------------------------------
# DICE (Directed Sparsification)
# ---------------------------------------------------------------------------
def dice_masked_weight(weight: ArrayLike, info: ArrayLike, p: float) -> Array:
    """Compute the DICE-masked weight matrix.

    Matches RouteDICE.calculate_mask_weight (funcs.py:172-180): contribution =
    mean-activation * weight, global percentile threshold over the full (C, d)
    contribution matrix, then zero out weights at or below the threshold.

    Args:
        weight: (C, d) final linear layer weight.
        info: (d,) mean activation per input dimension.
        p: sparsification percentile (0 < p < 100).
    """
    weight = jnp.asarray(weight)
    info = jnp.asarray(info)
    contrib = info[None, :] * weight  # (C, d)
    thresh = jnp.percentile(contrib, p)
    mask = (contrib > thresh).astype(weight.dtype)
    return weight * mask


def route_dice_logits(x: ArrayLike, masked_w: ArrayLike, bias: Optional[ArrayLike]) -> Array:
    """Linear layer with the DICE-masked weight (funcs.py:182-190)."""
    out = jnp.matmul(
        jnp.asarray(x), jnp.asarray(masked_w).T, precision=jax.lax.Precision.HIGHEST
    )
    if bias is not None:
        out = out + jnp.asarray(bias)
    return out


class RouteDICE:
    """DICE routed-linear layer as a pure callable (reference funcs.py:124-190).

    The reference subclasses torch.nn.Linear with a lazily-built masked
    weight and a hard-coded ``.cuda()`` (funcs.py:180,185 — broke CPU runs).
    Here the mask is computed once from (weight, info, p) and application is
    a jitted matmul; load weights via the constructor instead of
    ``load_state_dict``.
    """

    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = True,
        p: float = 90,
        info: Optional[np.ndarray] = None,
        weight: Optional[ArrayLike] = None,
        bias_value: Optional[ArrayLike] = None,
    ):
        assert 0 < p < 100, "p must be greater than 0 and less than 100"
        if info is not None:
            assert isinstance(info, np.ndarray), "info must be a numpy array or None"
        self.in_features = in_features
        self.out_features = out_features
        self.p = p
        self.info = info
        self.use_bias = bias
        self.weight = jnp.asarray(weight) if weight is not None else None
        self.bias = jnp.asarray(bias_value) if bias_value is not None else None
        self.masked_w = None

    def load_params(self, weight: ArrayLike, bias: Optional[ArrayLike] = None):
        self.weight = jnp.asarray(np.asarray(weight))
        if bias is not None:
            self.bias = jnp.asarray(np.asarray(bias))
        self.masked_w = None
        return self

    def calculate_mask_weight(self):
        assert self.weight is not None and self.info is not None
        self.masked_w = dice_masked_weight(self.weight, self.info, self.p)

    def __call__(self, x: ArrayLike) -> Array:
        if self.masked_w is None:
            self.calculate_mask_weight()
        return route_dice_logits(x, self.masked_w, self.bias if self.use_bias else None)

    forward = __call__


def get_dice_feat_mean_react_percentile(
    dnn_model, ind_dataloader, react_percentile: int = 90, channel_axis: int = 1
):
    """DICE mean-activation vector + ReAct percentile from pooled conv features
    (reference funcs.py:468-495).

    ``dnn_model`` is a callable returning 4-D feature maps (the reference
    requires a ``dice_precompute`` model mode); maps are global-average-pooled
    to (B, C). ``channel_axis`` = 1 for NCHW (the reference's torch layout) or
    3/-1 for NHWC.
    """
    assert 0 < react_percentile < 100, (
        "react_percentile must be greater than 0 and less than 100"
    )
    spatial = (2, 3) if channel_axis == 1 else (1, 2)
    feat_log = []
    for batch in ind_dataloader:
        inputs = batch[0] if isinstance(batch, (tuple, list)) else batch
        outputs = jnp.asarray(np.asarray(dnn_model(inputs)))
        if outputs.ndim == 4:
            outputs = jnp.mean(outputs, axis=spatial)
        feat_log.append(np.asarray(outputs))
    feat_log_array = np.concatenate(feat_log, axis=0)
    return feat_log_array.mean(0), float(
        np.percentile(feat_log_array, react_percentile)
    )


# ---------------------------------------------------------------------------
# ASH (Activation Shaping with Scaling)
# ---------------------------------------------------------------------------
def ash_s_linear_layer(x: ArrayLike, percentile: int = 85) -> Array:
    """ASH-S pruning + exponential rescaling for 2-D activations.

    Matches reference funcs.py:230-261: keep the top-k of each row
    (k = n - round(n * p / 100)), zero the rest, then multiply by
    exp(sum_before / sum_after) per row.
    """
    x = jnp.asarray(x)
    assert x.ndim == 2
    n = x.shape[1]
    k = n - int(np.round(n * percentile / 100.0))
    s1 = jnp.sum(x, axis=1)
    top_vals, top_idx = jax.lax.top_k(x, k)  # exact top-k, ties as argpartition
    scattered = jnp.zeros_like(x)
    rows = jnp.arange(x.shape[0])[:, None]
    scattered = scattered.at[rows, top_idx].set(top_vals)
    s2 = jnp.sum(scattered, axis=1)
    return scattered * jnp.exp(s1 / s2)[:, None]


def ash_s_conv_layer(x: ArrayLike, percentile: int = 65) -> Array:
    """ASH-S for 4-D (B, C, H, W) feature maps (reference funcs.py:194-227)."""
    x = jnp.asarray(x)
    assert x.ndim == 4
    b = x.shape[0]
    n = int(np.prod(x.shape[1:]))
    k = n - int(np.round(n * percentile / 100.0))
    flat = x.reshape(b, n)
    s1 = jnp.sum(flat, axis=1)
    top_vals, top_idx = jax.lax.top_k(flat, k)
    scattered = jnp.zeros_like(flat)
    rows = jnp.arange(b)[:, None]
    scattered = scattered.at[rows, top_idx].set(top_vals)
    s2 = jnp.sum(scattered, axis=1)
    out = scattered * jnp.exp(s1 / s2)[:, None]
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# ReAct
# ---------------------------------------------------------------------------
def react_clip_logits(
    feats: ArrayLike, threshold: float, weight: ArrayLike, bias: ArrayLike
) -> Array:
    """Clip activations at `threshold` then apply the final linear layer
    (reference postprocessors.py:1465-1474)."""
    clipped = jnp.clip(jnp.asarray(feats), max=threshold)
    return jnp.matmul(
        clipped, jnp.asarray(weight).T, precision=jax.lax.Precision.HIGHEST
    ) + jnp.asarray(bias)


# ---------------------------------------------------------------------------
# DDU / GMM
# ---------------------------------------------------------------------------
class GMMState:
    """Per-class Gaussian mixture state: a pytree of (means, cholesky factors).

    Replaces the reference's torch.distributions.MultivariateNormal object
    (funcs.py:332-335). Classes without training samples are dropped, mirroring
    the reference's NaN-row removal (funcs.py:306-323).
    """

    def __init__(self, means: Array, chols: Array, jitter: Array):
        self.means = means
        self.chols = chols
        self.jitter = jitter

    def log_prob(self, x: ArrayLike) -> Array:
        """(N, C) per-class log-densities (torch MVN ``log_prob`` semantics)."""
        x = jnp.asarray(x)
        if x.ndim == 3:  # reference passes (N, 1, d); broadcast against classes
            x = x[:, 0, :]
        return mvn_log_prob(x, self.means, self.chols)


def gmm_fit(
    embeddings: ArrayLike, labels: ArrayLike, num_classes: int
) -> Tuple[GMMState, float]:
    """Fit per-class MVNs with the reference's jitter ladder (funcs.py:265-344).

    Per-class covariance uses 1/(n-1) with the n==1 -> divide-by-1 guard
    (funcs.py:289-294). Returns (GMMState, max jitter used).
    """
    x = jnp.asarray(embeddings, dtype=jnp.float32)
    labels_np = np.asarray(labels).astype(np.int64)
    d = x.shape[1]

    means = class_means(x, jnp.asarray(labels_np), num_classes)  # (C, d), NaN rows empty
    counts = np.bincount(labels_np, minlength=num_classes).astype(np.float32)

    one_hot = jax.nn.one_hot(jnp.asarray(labels_np), num_classes, dtype=x.dtype)  # (n, C)
    safe_means = jnp.where(jnp.isnan(means), 0.0, means)

    def class_cov_sum(args):
        mu, w = args  # (d,), (n,)
        xc = (x - mu[None, :]) * w[:, None]
        # Masked rows are exactly zero, so they add nothing to the outer-product sum.
        return jnp.matmul(xc.T, xc, precision=jax.lax.Precision.HIGHEST)

    cov_sums = jax.lax.map(class_cov_sum, (safe_means, one_hot.T))  # (C, d, d)
    denom = np.maximum(counts - 1.0, 1.0)  # n==1 -> divide by 1 (reference guard)
    covs = cov_sums / jnp.asarray(denom)[:, None, None]

    keep = counts > 0
    if not keep.all():
        means = means[np.asarray(keep)]
        covs = covs[np.asarray(keep)]

    chols, jitters = mvn_fit_cholesky(covs)
    state = GMMState(means=means, chols=chols, jitter=jitters)
    return state, float(np.max(np.asarray(jitters))) if jitters.size else 0.0


def gmm_log_prob(state: GMMState, x: ArrayLike) -> Array:
    return state.log_prob(x)


# ---------------------------------------------------------------------------
# GEN
# ---------------------------------------------------------------------------
def generalized_entropy(probs: ArrayLike, gamma: float, M: int) -> Array:
    """Generalized entropy over the top-M probabilities (funcs.py:347-375)."""
    probs = jnp.asarray(probs)
    probs_sorted = jnp.sort(probs, axis=1)[:, -M:]
    scores = jnp.sum(probs_sorted**gamma * (1.0 - probs_sorted) ** gamma, axis=1)
    return -scores


# ---------------------------------------------------------------------------
# MC-dropout predictive uncertainty
# ---------------------------------------------------------------------------
def get_predictive_uncertainty_score(
    input_samples: ArrayLike, mcd_nro_samples: int
) -> Tuple[Array, Array]:
    """Predictive entropy and mutual information from stacked MC logits.

    Matches reference funcs.py:430-465: softmax over logits, group rows into
    (n_images, mc_samples, classes), then
    pred_h = H(mean_s p), mi = pred_h - mean_s H(p_s).
    """
    logits = jnp.asarray(input_samples)
    assert logits.shape[0] % mcd_nro_samples == 0, (
        "Input tensor first dimension must be divisible by the mcd_nro_samples"
    )
    probs = jax.nn.softmax(logits, axis=1)
    probs = probs.reshape(-1, mcd_nro_samples, probs.shape[-1])
    expected = jnp.mean(probs, axis=1)
    pred_h = -jnp.sum(expected * jnp.log(expected), axis=1)
    per_sample_h = -jnp.sum(probs * jnp.log(probs), axis=-1)
    expected_h = jnp.mean(per_sample_h, axis=1)
    mi = pred_h - expected_h
    return pred_h, mi


def get_mcd_pred_uncertainty_score(
    forward_fn, images: ArrayLike, rng: jax.Array, mcd_nro_samples: int = 2
) -> Tuple[Array, Array, Array]:
    """Run `mcd_nro_samples` stochastic forwards and compute pred-H / MI.

    TPU-native analog of reference funcs.py:378-427: instead of looping model
    calls, the MC axis is vmapped with per-sample folded RNG.

    Args:
        forward_fn: callable (rng, images) -> logits with dropout active.
        images: (B, ...) input batch.
        rng: base PRNG key.
    """
    keys = jax.random.split(rng, mcd_nro_samples)
    logits = jax.vmap(lambda k: forward_fn(k, images))(keys)  # (S, B, C)
    probs = jax.nn.softmax(logits, axis=-1)
    probs_bsc = jnp.transpose(probs, (1, 0, 2))  # (B, S, C)
    expected = jnp.mean(probs_bsc, axis=1)
    pred_h = -jnp.sum(expected * jnp.log(expected), axis=1)
    per_sample_h = -jnp.sum(probs_bsc * jnp.log(probs_bsc), axis=-1)
    mi = pred_h - jnp.mean(per_sample_h, axis=1)
    return probs_bsc, pred_h, mi
