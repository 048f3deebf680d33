"""Image-level MC-dropout latent extractors, batch-first.

TPU-native equivalents of the reference extractors (reference:
runia_core/feature_extraction/image_level.py:41-410,634-694). Design changes
(SURVEY.md section 7.1):

* hooks -> tapped forwards: the model is a pure callable
  ``images -> (outputs, {tap: activation})``;
* batch-size-1 restriction removed: dataloaders may yield any batch size;
* the per-image MC loop becomes a vmapped axis with folded RNG
  (sampling.mc_dropblock_samples), so the "fast" extractor runs the model
  once per batch and replays DropBlock locally — the same trick as the
  reference's FastMCDSamplesExtractor but as one XLA program per batch.

Output layout parity: ``latent_space_means`` is (n_images * S, d) with each
image's S samples contiguous — exactly what ``get_dl_h_z`` expects.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Union
from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.sampling import mc_dropblock_samples
from runia_core_tpu.ops.dropblock import dropblock2d, dropout

__all__ = [
    "FastMCDSamplesExtractor",
    "MCDSamplesExtractor",
    "ImageLvlFeatureExtractor",
    "get_latent_representation_mcd_samples",
    "deeplabv3p_get_ls_mcd_samples",
]


def _std_hw(noised: jnp.ndarray, channel_axis: int) -> jnp.ndarray:
    """Std over W then std of those over H (reference utils.py:111-124)."""
    if channel_axis == 1:  # (B, C, H, W)
        return jnp.std(jnp.std(noised, axis=3, ddof=1), axis=2, ddof=1)
    return jnp.std(jnp.std(noised, axis=2, ddof=1), axis=1, ddof=1)  # NHWC


class _ExtractorBase:
    """Common config for the latent extractors (reference abstract_classes.py:104-246
    minus the hook plumbing and the batch-size-1 assertion)."""

    def __init__(
        self,
        model: Callable,
        layer_type: str,
        reduction_method: str,
        tap: str = "pre_pool",
        channel_axis: int = 3,
        return_raw_predictions: bool = False,
        return_stds: bool = False,
        mcd_nro_samples: int = 1,
        dropblock_probs: Union[float, List] = 0.0,
        dropblock_sizes: Union[int, List] = 0,
        return_gt_labels: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        assert layer_type in ("FC", "Conv"), "Layer type must be either 'FC' or 'Conv'"
        self.model = model
        self.layer_type = layer_type
        self.reduction_method = reduction_method
        self.tap = tap
        self.channel_axis = channel_axis
        self.return_raw_predictions = return_raw_predictions
        self.return_stds = return_stds
        self.mcd_nro_samples = mcd_nro_samples
        self.return_gt_labels = return_gt_labels
        if isinstance(dropblock_probs, (list, tuple)):
            self.dropblock_probs = list(dropblock_probs)
            self.dropblock_sizes = list(dropblock_sizes)
        else:
            self.dropblock_probs = [dropblock_probs]
            self.dropblock_sizes = [dropblock_sizes]
        self.dropout_n_layers = len(self.dropblock_probs)
        self._rng = rng if rng is not None else jax.random.key(0)
        self._step = 0

    def _next_key(self):
        key = jax.random.fold_in(self._rng, self._step)
        self._step += 1
        return key


class FastMCDSamplesExtractor(_ExtractorBase):
    """One forward per batch + local DropBlock/Dropout replay on the cached
    activation (reference image_level.py:41-249).

    Multi-layer taps: pass ``tap`` as a list of tap names with matching
    dropblock_probs/sizes lists; per-sample features are concatenated
    (reference image_level.py:220-236).
    """

    def __init__(self, model, layer_type, reduction_method, tap="pre_pool", **kwargs):
        super().__init__(model, layer_type, reduction_method, tap=tap, **kwargs)
        assert reduction_method in ("mean", "fullmean"), (
            "Only mean and fullmean reduction methods supported"
        )
        if self.return_stds and layer_type == "FC":
            # Spatial stds are a Conv-map statistic; the FC path has no
            # spatial axes to reduce (and would crash on an empty concat).
            raise ValueError("return_stds is only supported for layer_type='Conv'")
        self.taps = [self.tap] if isinstance(self.tap, str) else list(self.tap)
        if len(self.taps) == 1 and self.dropout_n_layers > 1:
            self.taps = self.taps * self.dropout_n_layers

    def _sample_batch(self, taps: Dict[str, jnp.ndarray], key) -> Dict[str, jnp.ndarray]:
        per_layer_means = []
        per_layer_stds = []
        for i in range(self.dropout_n_layers):
            latent = taps[self.taps[i]]
            if self.layer_type == "Conv":
                samples = mc_dropblock_samples(
                    jax.random.fold_in(key, i),
                    latent,
                    self.mcd_nro_samples,
                    self.dropblock_sizes[i],
                    self.dropblock_probs[i],
                    "Conv",
                    reduction=self.reduction_method,
                    channel_axis=self.channel_axis,
                )  # (B, S, d_i)
                if self.return_stds:
                    keys = jax.random.split(jax.random.fold_in(key, i), self.mcd_nro_samples)

                    def one_std(k, latent=latent, i=i):
                        noised = dropblock2d(
                            k, latent, self.dropblock_probs[i], self.dropblock_sizes[i],
                            channel_axis=self.channel_axis,
                        )
                        return _std_hw(noised, self.channel_axis)

                    stds = jnp.swapaxes(jax.vmap(one_std)(keys), 0, 1)  # (B, S, C)
                    per_layer_stds.append(stds)
            else:  # FC: plain dropout on the (B, d) activation
                keys = jax.random.split(jax.random.fold_in(key, i), self.mcd_nro_samples)

                def one_fc(k, latent=latent, i=i):
                    return dropout(k, latent, self.dropblock_probs[i])

                samples = jnp.swapaxes(jax.vmap(one_fc)(keys), 0, 1)  # (B, S, d)
            per_layer_means.append(samples)
        out = {"latent_space_means": jnp.concatenate(per_layer_means, axis=-1)}
        if self.return_stds:
            out["stds"] = jnp.concatenate(per_layer_stds, axis=-1)
        return out

    def get_ls_samples(self, data_loader: Iterable, **kwargs) -> Dict[str, np.ndarray]:
        """Extract MC latent samples for a whole dataset.

        Args:
            data_loader: iterable of (images, labels) batches; images are
                (B, H, W, C) for channel_axis=3 (or NCHW for 1).

        Returns:
            dict with 'latent_space_means' (n_images * S, d) and optionally
            'stds', 'raw_preds', 'gt_labels' — reference layout
            (image_level.py:127-162).
        """
        results: Dict[str, list] = {"latent_space_means": []}
        if self.return_raw_predictions:
            results["raw_preds"] = []
        if self.return_stds:
            results["stds"] = []
        if self.return_gt_labels:
            results["gt_labels"] = []
        for images, gt_labels in data_loader:
            outputs, taps = self.model(jnp.asarray(np.asarray(images)))
            batch_out = self._sample_batch(taps, self._next_key())
            b, s, d = batch_out["latent_space_means"].shape
            results["latent_space_means"].append(
                np.asarray(batch_out["latent_space_means"]).reshape(b * s, d)
            )
            if self.return_stds:
                bs = batch_out["stds"]
                results["stds"].append(np.asarray(bs).reshape(b * s, -1))
            if self.return_raw_predictions:
                results["raw_preds"].append(np.asarray(outputs))
            if self.return_gt_labels:
                # (B,) rows: ragged final batches concatenate cleanly (the
                # reference's reshape(1, -1) was batch-size-1 code).
                results["gt_labels"].append(np.asarray(gt_labels).reshape(-1))
        out = {k: np.concatenate(v, axis=0) for k, v in results.items()}
        print("Latent representation vector size: ", out["latent_space_means"].shape[1])
        return out


class MCDSamplesExtractor(_ExtractorBase):
    """Classic MC dropout: N stochastic forward passes per batch
    (reference image_level.py:252-410).

    The model must accept a PRNG key: ``model(images, key) ->
    (outputs, taps)`` with dropout active. The N forwards are one vmapped
    program over folded keys instead of a Python loop.
    """

    def __init__(
        self,
        model,
        layer_type,
        reduction_method,
        tap="pre_pool",
        avg_pooling_parameters=None,
        **kwargs,
    ):
        super().__init__(model, layer_type, reduction_method, tap=tap, **kwargs)
        assert reduction_method in ("mean", "fullmean", "avgpool"), (
            "Only mean, fullmean and avg pool reduction methods supported"
        )
        if avg_pooling_parameters is not None:
            assert len(avg_pooling_parameters) == 3, (
                "Three parameters are needed for average pooling"
            )
        self.avg_pooling_parameters = avg_pooling_parameters

    def _reduce(self, latent: jnp.ndarray) -> jnp.ndarray:
        if self.layer_type != "Conv":
            return latent.reshape(latent.shape[0], -1)
        if self.reduction_method == "fullmean":
            spatial = (2, 3) if self.channel_axis == 1 else (1, 2)
            return jnp.mean(latent, axis=spatial)
        if self.reduction_method == "mean":
            if self.channel_axis == 1:
                return jnp.mean(latent, axis=3).reshape(latent.shape[0], -1)
            # NHWC: transpose (B, H, C) -> (B, C, H) before flattening so the
            # feature columns are C-major — the same ordering as the NCHW
            # path and sampling.mc_dropblock_samples, keeping fitted detector
            # state interchangeable across layouts and extractors.
            return jnp.mean(latent, axis=2).swapaxes(1, 2).reshape(
                latent.shape[0], -1
            )
        # avgpool
        k, s, p = self.avg_pooling_parameters
        if self.channel_axis == 1:
            window, strides = (1, 1, k, k), (1, 1, s, s)
            pads = ((0, 0), (0, 0), (p, p), (p, p))
        else:
            window, strides = (1, k, k, 1), (1, s, s, 1)
            pads = ((0, 0), (p, p), (p, p), (0, 0))
        summed = jax.lax.reduce_window(
            latent, 0.0, jax.lax.add, window, strides, pads
        )
        return (summed / (k * k)).reshape(latent.shape[0], -1)

    def get_ls_samples(self, data_loader: Iterable, **kwargs):
        dl_samples = []
        raw_predictions = []
        for images, _ in data_loader:
            images = jnp.asarray(np.asarray(images))
            keys = jax.random.split(self._next_key(), self.mcd_nro_samples)

            def one_forward(k):
                outputs, taps = self.model(images, k)
                return outputs, self._reduce(taps[self.tap])

            outputs, reduced = jax.vmap(one_forward)(keys)  # (S, B, ...), (S, B, d)
            b = reduced.shape[1]
            per_image = jnp.swapaxes(reduced, 0, 1).reshape(
                b * self.mcd_nro_samples, -1
            )
            dl_samples.append(np.asarray(per_image))
            if self.return_raw_predictions:
                raw_predictions.append(
                    np.asarray(jnp.swapaxes(outputs, 0, 1)).reshape(
                        b * self.mcd_nro_samples, -1
                    )
                )
        stacked = np.concatenate(dl_samples, axis=0)
        print("MCD N_samples: ", stacked.shape[1])
        if self.return_raw_predictions:
            return stacked, np.concatenate(raw_predictions, axis=0)
        return stacked


class ImageLvlFeatureExtractor:
    """Whole-image latent features from object-detection architectures.

    TPU-native equivalent of reference image_level.py:413-577: run the
    adapted detector, reduce each captured feature map to per-channel means
    (fullmean), and concatenate across maps — one feature row per image,
    alongside the per-detection logits/features the architecture provides.
    Images with no detections are tracked in 'no_obj'.
    """

    def __init__(
        self,
        model: Callable,
        architecture: str,
        rcnn_extraction_type: Optional[str] = None,
        return_raw_predictions: bool = False,
        return_stds: bool = False,
    ):
        from runia_core_tpu.extraction.adapters import (
            SUPPORTED_OBJECT_DETECTION_ARCHITECTURES,
        )

        assert architecture in SUPPORTED_OBJECT_DETECTION_ARCHITECTURES, (
            f"Only {SUPPORTED_OBJECT_DETECTION_ARCHITECTURES} are supported"
        )
        self.model = model
        self.architecture = architecture
        self.rcnn_extraction_type = rcnn_extraction_type
        self.return_raw_predictions = return_raw_predictions
        if return_stds:
            raise NotImplementedError  # matches reference image_level.py:567-574

    def _get_samples_one_image(self, image, predict_conf: float, **kwargs):
        from runia_core_tpu.extraction.adapters import postprocess_architecture_taps

        det = self.model(image, predict_conf, **kwargs)
        results: Dict[str, np.ndarray] = {}
        if det.logits is not None:
            results["logits"] = np.asarray(det.logits)
        if det.features is not None:
            results["features"] = np.asarray(det.features)
        found_objs_flag = np.asarray(det.boxes).reshape(-1, 4).shape[0] > 0

        latent_sample = postprocess_architecture_taps(
            self.architecture, det.fmaps, self.rcnn_extraction_type
        )
        reduced = [
            np.asarray(jnp.mean(jnp.asarray(t), axis=(2, 3))).reshape(1, -1)
            for t in latent_sample
        ]
        results["latent_space_means"] = np.concatenate(reduced, axis=1)
        if self.return_raw_predictions:
            results["raw_preds"] = det
        return results, found_objs_flag

    def get_ls_samples(
        self, data_loader: Iterable, predict_conf: float = 0.25, **kwargs
    ) -> Dict:
        from runia_core_tpu.extraction.object_level import BoxFeaturesExtractor

        results: Dict[str, list] = {"latent_space_means": [], "features": [], "logits": []}
        no_obj_imgs = []
        for loader_contents in data_loader:
            impath, image, im_id = BoxFeaturesExtractor.unpack_dataloader(loader_contents)
            result_img, found_obj_flag = self._get_samples_one_image(
                image=image, predict_conf=predict_conf, **kwargs
            )
            for result_type, result_value in result_img.items():
                if result_type in results:
                    results[result_type].append(result_value)
            if not found_obj_flag:
                no_obj_imgs.append(impath[0])
        out = {
            k: (np.concatenate(v, axis=0) if len(v) > 0 else v)
            for k, v in results.items()
        }
        out["no_obj"] = no_obj_imgs
        print("Latent representation vector size: ", out["latent_space_means"].shape[1])
        print(f"No objects in {len(no_obj_imgs)} images")
        return out


def deeplabv3p_get_ls_mcd_samples(
    model_module: Callable,
    dataloader: Iterable,
    mcd_nro_samples: int,
    hook_dropout_layer: str = "pre_pool",
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """Deprecated reference-named helper (image_level.py:580-631): classic
    MC-dropout extraction from a segmentation model's dropout-layer tap."""
    warn(
        "This method is deprecated. Use one of the Extractor classes instead",
        DeprecationWarning,
        stacklevel=2,
    )
    extractor = MCDSamplesExtractor(
        model=model_module,
        layer_type="Conv",
        reduction_method="fullmean",
        tap=hook_dropout_layer,
        mcd_nro_samples=mcd_nro_samples,
        rng=rng,
    )
    return extractor.get_ls_samples(dataloader)


def get_latent_representation_mcd_samples(
    dnn_model: Callable,
    dataloader: Iterable,
    mcd_nro_samples: int,
    layer_hook: str,
    layer_type: str,
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """Deprecated reference-named helper (image_level.py:634-694): classic
    MC-dropout extraction via a stochastic tapped model."""
    warn(
        "This method is deprecated. Use one of the Extractor classes instead",
        DeprecationWarning,
        stacklevel=2,
    )
    assert layer_type in ("FC", "Conv"), "Layer type must be either 'FC' or 'Conv'"
    extractor = MCDSamplesExtractor(
        model=dnn_model,
        layer_type=layer_type,
        reduction_method="fullmean" if layer_type == "Conv" else "mean",
        tap=layer_hook,
        mcd_nro_samples=mcd_nro_samples,
        rng=rng,
    )
    return extractor.get_ls_samples(dataloader)
