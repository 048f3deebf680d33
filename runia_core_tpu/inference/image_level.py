"""Online image-level LaREx / LaRD inference.

TPU-native equivalents of the reference's inference modules (reference:
runia_core/inference/image_level.py:31-313). Two levels of API:

* :class:`LaRExInference` / :class:`LaRDInference` keep the reference's
  object API (model + postprocessor + optional PCA, ``get_score`` per batch,
  ``record_time`` benchmark twins) but are batch-first — the reference is
  locked to one image per call.
* :func:`build_larex_scorer` fuses the entire pipeline — forward pass,
  vmapped MC-DropBlock sampling, KL entropy, PCA projection, Mahalanobis /
  KDE scoring — into ONE jitted XLA program. This is the production scoring
  path and the benchmark target ("OoD-scored images/sec/chip").
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.detectors.base import Postprocessor, record_time
from runia_core_tpu.evaluation.entropy import get_dl_h_z, neighbors_for
from runia_core_tpu.ops.dropblock import dropblock2d
from runia_core_tpu.ops.entropy import marginal_entropy
from runia_core_tpu.ops.linalg import mahalanobis_quadform
from runia_core_tpu.reduction import PCAState, apply_pca_transform, pca_transform
from runia_core_tpu.sampling import MCSamplerModule, mc_dropblock_samples

__all__ = [
    "InferenceModule",
    "ProbabilisticInferenceModule",
    "ObjectDetectionInferenceBase",
    "LaRExInference",
    "LaRDInference",
    "build_larex_scorer",
]


class InferenceModule:
    """Base runtime-inference module (reference abstract_classes.py:217-279).

    The device plumbing of the reference (``.to(device)``) is unnecessary —
    JAX places arrays when the jitted model runs.
    """

    def __init__(self, model, postprocessor):
        self.model = model  # callable images -> (outputs, taps dict)
        self.postprocessor = postprocessor

    def get_score(self, input_image, *args, **kwargs):
        raise NotImplementedError


class ProbabilisticInferenceModule(InferenceModule):
    """Inference base carrying MC-dropout configuration
    (reference abstract_classes.py:282-321)."""

    def __init__(self, model, postprocessor, drop_block_prob: float,
                 drop_block_size: int, mcd_samples_nro: int):
        super().__init__(model, postprocessor)
        self.drop_block_prob = drop_block_prob
        self.drop_block_size = drop_block_size
        self.mcd_samples_nro = mcd_samples_nro


class ObjectDetectionInferenceBase(InferenceModule):
    """Object-detection inference base (reference abstract_classes.py:324-370);
    'hooked_layers' become tap names in the functional design."""

    def __init__(self, model, postprocessor, architecture: str,
                 hooked_layers=None, pca_transform=None,
                 rcnn_extraction_type: str = None):
        super().__init__(model, postprocessor)
        self.architecture = architecture
        self.rcnn_extraction_type = rcnn_extraction_type
        self.hooked_layers = hooked_layers
        self.pca_transform = pca_transform


# Internal alias kept for the existing subclasses below.
_InferenceBase = InferenceModule


class LaRExInference(_InferenceBase):
    """LaREx online scoring: tap -> MC DropBlock -> entropy -> PCA -> density.

    Reference: runia_core/inference/image_level.py:31-198. The ``model`` is a
    tapped forward (see models.build_tapped_forward): images ->
    (outputs, {tap_name: activation}). ``layer_hook`` in ``get_score`` is the
    tap name (a string), the functional replacement of the reference's Hook
    object.
    """

    def __init__(
        self,
        model: Callable,
        postprocessor: Postprocessor,
        drop_block_prob: float,
        drop_block_size: int,
        mcd_samples_nro: int,
        mcd_sampler=MCSamplerModule,
        pca_transform=None,
        layer_type: str = "Conv",
        channel_axis: int = 3,
        rng: Optional[jax.Array] = None,
    ):
        super().__init__(model, postprocessor)
        self.drop_block_prob = drop_block_prob
        self.drop_block_size = drop_block_size
        self.mcd_samples_nro = mcd_samples_nro
        self.layer_type = layer_type
        self.channel_axis = channel_axis
        self.pca_transform = pca_transform
        self.mc_sampler = mcd_sampler(
            mc_samples=mcd_samples_nro,
            layer_type=layer_type,
            drop_prob=drop_block_prob,
            block_size=drop_block_size,
        )
        self._rng = rng if rng is not None else jax.random.key(0)
        self._step = 0

    def _next_key(self):
        key = jax.random.fold_in(self._rng, self._step)
        self._step += 1
        return key

    def get_score(self, input_image, layer_hook: str = "pre_pool", key=None):
        """Score a batch of images: returns (model outputs, per-image scores).

        Batch-first generalization of reference image_level.py:96-120 (which
        handles exactly one image).
        """
        if key is None:
            key = self._next_key()
        outputs, taps = self.model(jnp.asarray(input_image))
        latent_rep = taps[layer_hook]
        mc_samples = mc_dropblock_samples(
            key,
            latent_rep,
            self.mcd_samples_nro,
            self.drop_block_size,
            self.drop_block_prob,
            self.layer_type,
            channel_axis=self.channel_axis,
        )  # (B, S, d)
        k = neighbors_for(self.mcd_samples_nro)
        sample_h_z = marginal_entropy(mc_samples, k)  # (B, d)
        if self.pca_transform is not None:
            sample_h_z = jnp.asarray(apply_pca_transform(np.asarray(sample_h_z), self.pca_transform))
        sample_larex_score = self.postprocessor.postprocess(np.asarray(sample_h_z))
        return outputs, sample_larex_score

    @record_time
    def test_time_inference(self, input_image, layer_hook: str = "pre_pool"):
        """get_score + wall-clock (reference image_level.py:122-134)."""
        return self.get_score(input_image, layer_hook)

    @record_time
    def get_layer_mc_samples(self, input_image, layer_hook: str = "pre_pool"):
        """Forward + MC sampling only (timing twin, reference :136-154)."""
        _, taps = self.model(jnp.asarray(input_image))
        return mc_dropblock_samples(
            self._next_key(),
            taps[layer_hook],
            self.mcd_samples_nro,
            self.drop_block_size,
            self.drop_block_prob,
            self.layer_type,
            channel_axis=self.channel_axis,
        )

    @record_time
    def get_mc_samples_full_inference(self, input_image, layer_hook: str = "pre_pool"):
        """Full-MCD baseline: N complete forward passes (reference :156-182).

        Kept for fast-vs-full benchmarking; the model forward is re-run per
        MC sample (the tap output is identical across runs for a
        deterministic forward, exactly like the reference's repeated
        forwards with dropout disabled in the backbone).
        """
        mc_samples = []
        for _ in range(self.mcd_samples_nro):
            _, taps = self.model(jnp.asarray(input_image))
            mc_samples.append(taps[layer_hook])
        return np.asarray(jnp.concatenate(mc_samples, axis=0))


class LaRDInference(_InferenceBase):
    """LaRD: direct feature density, no MC sampling / entropy
    (reference image_level.py:201-313)."""

    def __init__(self, model, postprocessor, pca_transform=None, layer_type="Conv",
                 channel_axis: int = 3):
        super().__init__(model, postprocessor)
        self.layer_type = layer_type
        self.channel_axis = channel_axis
        self.pca_transform = pca_transform

    def _reduce(self, representation: jnp.ndarray) -> np.ndarray:
        if self.layer_type == "Conv" and representation.ndim == 4:
            spatial = (2, 3) if self.channel_axis == 1 else (1, 2)
            return np.asarray(jnp.mean(representation, axis=spatial))
        if representation.ndim > 2:
            return np.asarray(jnp.mean(representation, axis=1)).reshape(
                representation.shape[0], -1
            )
        return np.asarray(representation)

    def get_score(self, input_image, layer_hook: str = "pre_pool"):
        outputs, taps = self.model(jnp.asarray(input_image))
        latent_rep = self._reduce(taps[layer_hook])
        if self.pca_transform is not None:
            latent_rep = apply_pca_transform(latent_rep, self.pca_transform)
        sample_score = self.postprocessor.postprocess(latent_rep)
        return outputs, sample_score

    @record_time
    def test_time_inference(self, input_image, layer_hook: str = "pre_pool"):
        return self.get_score(input_image, layer_hook)


def build_larex_scorer(
    apply_fn: Callable,
    pca_state: Optional[PCAState],
    detector_state: dict,
    mcd_samples_nro: int = 16,
    drop_block_prob: float = 0.5,
    drop_block_size: int = 3,
    tap: str = "pre_pool",
    channel_axis: int = 3,
    detector: str = "MD",
) -> Callable:
    """Fuse the full LaREx pipeline into one jitted program.

    forward -> vmapped MC-DropBlock -> per-dim KL entropy -> PCA -> score,
    all on device; only the final (B,) scores ever reach the host — the
    host<->device boundary the reference crosses after extraction
    (SURVEY.md section 5 "Distributed communication backend") is pushed to
    the very end.

    Args:
        apply_fn: images -> (logits, taps dict) pure forward.
        pca_state: fitted PCAState or None.
        detector_state: for 'MD': {"feats_mean", "precision"};
            for 'KDE': {"train_embeddings", "bandwidth"}.
        detector: 'MD' (LaREM) or 'KDE' (LaRED).

    Returns:
        jitted (images, key) -> (logits, scores (B,)).
    """
    k_neighbors = neighbors_for(mcd_samples_nro)
    # ops/mc_entropy_pallas.py offers a single-kernel DropBlock+entropy path
    # (bit-identical results), but measured slower than the two-step pipeline
    # on v5e: its per-image (S, HW) x (HW, C) matmuls are too small to feed
    # the MXU, while XLA pipelines the two-step version across the batch.
    # Keep the two-step path as the default.
    use_fused_kernel = False

    @jax.jit
    def score(images, key):
        logits, taps = apply_fn(images)
        # Scoring numerics are always f32, regardless of the forward dtype:
        # bf16 channel means would coarsen the entropy distance resolution.
        latent = taps[tap].astype(jnp.float32)
        if use_fused_kernel:
            from runia_core_tpu.ops.mc_entropy_pallas import fused_mc_entropy

            h_z = fused_mc_entropy(
                key, latent, mcd_samples_nro, drop_block_size, drop_block_prob,
                k=k_neighbors,
            )  # (B, C)
        else:
            mc = mc_dropblock_samples(
                key,
                latent,
                mcd_samples_nro,
                drop_block_size,
                drop_block_prob,
                "Conv",
                channel_axis=channel_axis,
            )  # (B, S, C)
            h_z = marginal_entropy(mc, k_neighbors)  # (B, C)
        if pca_state is not None:
            h_z = pca_transform(pca_state, h_z)
        if detector == "MD":
            scores = -mahalanobis_quadform(
                h_z, detector_state["feats_mean"], detector_state["precision"]
            )
        elif detector == "KDE":
            from runia_core_tpu.detectors.latent import kde_log_density

            scores = kde_log_density(
                h_z, detector_state["train_embeddings"], detector_state["bandwidth"]
            )
        else:
            raise ValueError(f"Unsupported fused detector {detector}")
        return logits, scores

    return score
