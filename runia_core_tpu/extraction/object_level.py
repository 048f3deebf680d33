"""Object-level feature extraction: per-detection features via ROIAlign.

TPU-native equivalent of the reference BoxFeaturesExtractor (reference:
runia_core/feature_extraction/object_level.py:30-367). The adapted detection
model follows the DetectionResult protocol (extraction/adapters.py); the
ROI reduction runs through the separable-matmul ROIAlign (ops/roi_align.py)
and the MC-DropBlock entropy path through the vmapped sampler + batched
KL-entropy engine — no per-object Python loops, no process pools.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.evaluation.entropy import get_dl_h_z
from runia_core_tpu.extraction.adapters import (
    SUPPORTED_OBJECT_DETECTION_ARCHITECTURES,
    DetectionResult,
    postprocess_architecture_taps,
)
from runia_core_tpu.ops.roi_align import roi_align
from runia_core_tpu.sampling import MCSamplerModule

__all__ = [
    "BoxFeaturesExtractor",
    "_reduce_features_to_rois",
    "_dropblock_rois_get_entropy",
]


def _reduce_features_to_rois(
    latent_mcd_sample: List[jnp.ndarray],
    output_sizes,
    boxes: jnp.ndarray,
    img_shape: Tuple[int, int],
    sampling_ratio: int,
    n_hooked_reps: int,
    n_detected_objects: int,
    return_stds: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """ROIAlign each hooked map, then per-object per-channel mean (and std).

    Batched equivalent of reference object_level.py:254-309 (which loops
    objects x layers in Python): per layer j,
    spatial_scale = fmap_W / img_W, aligned=True; per-object features are
    channel means over the pooled window, concatenated across layers.

    Returns:
        (means (N, sum_C), stds (N, sum_C) or None) — the reference returns a
        list of per-object rows; we return the stacked array directly.
    """
    means, stds = [], []
    for j in range(n_hooked_reps):
        fmap = jnp.asarray(latent_mcd_sample[j])
        rois = roi_align(
            fmap,
            jnp.asarray(boxes),
            int(output_sizes[j]),
            spatial_scale=fmap.shape[3] / img_shape[1],
            sampling_ratio=sampling_ratio,
            aligned=True,
        )  # (N, C_j, o, o)
        means.append(jnp.mean(rois, axis=(2, 3)))
        if return_stds:
            stds.append(jnp.std(rois.reshape(rois.shape[0], rois.shape[1], -1),
                                axis=2, ddof=1))
    mean_out = jnp.concatenate(means, axis=1)
    std_out = jnp.concatenate(stds, axis=1) if return_stds else None
    return mean_out, std_out


def _dropblock_rois_get_entropy(
    latent_mcd_sample: List[jnp.ndarray],
    output_sizes,
    boxes: jnp.ndarray,
    img_shape: Tuple[int, int],
    sampling_ratio: int,
    n_hooked_reps: int,
    n_mcd_steps: int,
    mc_sampler: MCSamplerModule,
    key: Optional[jax.Array] = None,
) -> np.ndarray:
    """MC-DropBlock the pooled ROIs and return per-dimension KL entropies.

    Reference object_level.py:312-367 loops detections and spawns a process
    pool for the entropy; here all detections share one vmapped sampler call
    and one batched entropy program.
    """
    rois = [
        roi_align(
            jnp.asarray(latent_mcd_sample[i]),
            jnp.asarray(boxes),
            int(output_sizes[i]),
            spatial_scale=jnp.asarray(latent_mcd_sample[i]).shape[3] / img_shape[1],
            sampling_ratio=sampling_ratio,
            aligned=True,
        )
        for i in range(n_hooked_reps)
    ]
    rois = jnp.concatenate(rois, axis=1) if len(rois) > 1 else rois[0]  # (N, C, o, o)
    samples = mc_sampler(rois, key)  # (N, S, C) batched over detections
    if samples.ndim == 2:  # single detection squeezed
        samples = samples[None]
    n, s, d = samples.shape
    _, entropies = get_dl_h_z(np.asarray(samples).reshape(n * s, d), mcd_samples_nro=n_mcd_steps)
    return entropies


class BoxFeaturesExtractor:
    """Per-detection latent feature extraction for object detectors.

    Reference API preserved (object_level.py:30-251): ``get_ls_samples``
    iterates a dataloader and returns per-image dicts with
    latent_space_means / features / logits / boxes plus a 'no_obj' list;
    ``_get_samples_one_image`` is the online path reused by
    ObjectLevelInference.

    The torch model + hooks pair is replaced by an adapted model callable
    returning a DetectionResult (see extraction/adapters.py). Batch size is
    whatever the adapter supports — the reference's batch-1 assertion is
    dropped.
    """

    def __init__(
        self,
        model,
        architecture: str,
        roi_output_sizes,
        hooked_layers=None,
        device=None,
        return_raw_predictions: bool = False,
        return_stds: bool = False,
        mcd_nro_samples: int = 1,
        hook_layer_output: bool = True,
        dropblock_probs: Union[float, List] = 0.0,
        dropblock_sizes: Union[int, List] = 0,
        rcnn_extraction_type: str = None,
        extract_noise_entropies: bool = False,
        roi_sampling_ratio: int = -1,
        rng: Optional[jax.Array] = None,
    ):
        assert (
            architecture in SUPPORTED_OBJECT_DETECTION_ARCHITECTURES
        ), f"Only {SUPPORTED_OBJECT_DETECTION_ARCHITECTURES} are supported"
        assert rcnn_extraction_type in ("rpn_inter", "rpn_head", "shortcut", "backbone", None)
        self.model = model
        self.architecture = architecture
        self.rcnn_extraction_type = rcnn_extraction_type
        self.return_raw_predictions = return_raw_predictions
        self.return_stds = return_stds
        self.mcd_nro_samples = mcd_nro_samples
        self.dropblock_probs = dropblock_probs
        self.dropblock_sizes = dropblock_sizes
        if not isinstance(roi_output_sizes, list):
            roi_output_sizes = list(roi_output_sizes)
        self.roi_output_sizes = roi_output_sizes
        self.roi_sampling_ratio = roi_sampling_ratio
        self.n_hooked_reps = len(roi_output_sizes)

        # RCNN pyramid modes emit five feature levels (reference
        # object_level.py:97-102).
        if self.architecture == "rcnn" and self.rcnn_extraction_type != "shortcut":
            self.roi_output_sizes = self.roi_output_sizes * 5
            self.n_hooked_reps = 5

        self.extract_noise_entropies = extract_noise_entropies
        if self.extract_noise_entropies:
            self.mc_sampler = MCSamplerModule(
                mc_samples=self.mcd_nro_samples,
                block_size=self.dropblock_sizes,
                drop_prob=self.dropblock_probs,
                layer_type="Conv",
            )
        self._rng = rng if rng is not None else jax.random.key(0)
        self._step = 0

    def _next_key(self):
        key = jax.random.fold_in(self._rng, self._step)
        self._step += 1
        return key

    # -- dataloader unpacking ------------------------------------------------
    @staticmethod
    def unpack_dataloader(loader_contents) -> Tuple[List[str], Any, Any]:
        """Normalize loader items to (impath_list, image, im_id).

        Accepts (impath, image, im_id) tuples or dicts with
        'image'/'image_id' (+ optional 'file_name') keys — the functional
        replacement of the reference's per-framework unpacking
        (abstract_classes.py:345-408).
        """
        if isinstance(loader_contents, dict):
            image = loader_contents["image"]
            im_id = loader_contents.get("image_id", loader_contents.get("file_name"))
            impath = [loader_contents.get("file_name", str(im_id))]
            return impath, image, im_id
        impath, image, im_id = loader_contents
        if isinstance(impath, str):
            impath = [impath]
        return impath, image, im_id

    # -- per-image extraction ------------------------------------------------
    def _get_samples_one_image(
        self, image, predict_conf: float, **kwargs
    ) -> Tuple[Dict[str, Any], bool]:
        """Run the adapted model on one image and extract per-detection
        features (reference object_level.py:171-251)."""
        found_objs_flag = True
        det: DetectionResult = self.model(image, predict_conf, **kwargs)
        results: Dict[str, Any] = {}
        if det.logits is not None:
            results["logits"] = np.asarray(det.logits)
        if det.features is not None:
            results["features"] = np.asarray(det.features)

        boxes = np.asarray(det.boxes, dtype=np.float32).reshape(-1, 4)
        img_shape = det.img_shape
        n_detected_objects = boxes.shape[0]
        if n_detected_objects == 0:
            # Whole image as a single object (reference object_level.py:210-214)
            boxes = np.array(
                [[0.0, 0.0, img_shape[1], img_shape[0]]], dtype=np.float32
            )
            n_detected_objects = 1
            found_objs_flag = False

        latent_sample = postprocess_architecture_taps(
            self.architecture, det.fmaps, self.rcnn_extraction_type
        )
        if len(latent_sample) > 0:
            if not self.extract_noise_entropies:
                means, stds = _reduce_features_to_rois(
                    latent_mcd_sample=latent_sample,
                    output_sizes=self.roi_output_sizes,
                    boxes=jnp.asarray(boxes),
                    img_shape=img_shape,
                    sampling_ratio=self.roi_sampling_ratio,
                    n_hooked_reps=self.n_hooked_reps,
                    n_detected_objects=n_detected_objects,
                    return_stds=self.return_stds,
                )
                results["latent_space_means"] = np.asarray(means)
                if self.return_stds:
                    results["stds"] = np.asarray(stds)
            else:
                results["latent_space_means"] = _dropblock_rois_get_entropy(
                    latent_mcd_sample=latent_sample,
                    output_sizes=self.roi_output_sizes,
                    boxes=jnp.asarray(boxes),
                    img_shape=img_shape,
                    sampling_ratio=self.roi_sampling_ratio,
                    n_hooked_reps=self.n_hooked_reps,
                    n_mcd_steps=self.mcd_nro_samples,
                    mc_sampler=self.mc_sampler,
                    key=self._next_key(),
                )
        else:
            results["latent_space_means"] = []
        results["boxes"] = boxes
        if self.return_raw_predictions:
            results["raw_preds"] = det
        return results, found_objs_flag

    def get_ls_samples(
        self, data_loader: Iterable, predict_conf: float = 0.25, **kwargs
    ) -> Dict:
        """Extract per-detection features for a whole dataset.

        Returns {im_id: {latent_space_means, features, logits, boxes}, ...,
        'no_obj': [paths]} — the reference layout (object_level.py:104-169)
        consumed by get_aggregated_data_dict / calculate_all_baselines.
        """
        results: Dict[Any, Dict] = {}
        no_obj_imgs: List[str] = []
        for loader_contents in data_loader:
            impath, image, im_id = self.unpack_dataloader(loader_contents)
            result_img, found_obj_flag = self._get_samples_one_image(
                image=image, predict_conf=predict_conf, **kwargs
            )
            results[im_id] = {
                "latent_space_means": [],
                "features": [],
                "logits": [],
                "boxes": [],
            }
            if found_obj_flag:
                for result_type, result_value in result_img.items():
                    if result_type == "raw_preds":
                        results[im_id][result_type] = result_value
                    else:
                        results[im_id][result_type] = np.asarray(result_value)
            else:
                no_obj_imgs.append(impath[0])
        results["no_obj"] = no_obj_imgs
        print(f"No objects in {len(no_obj_imgs)} images")
        return results
