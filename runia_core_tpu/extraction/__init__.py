"""Feature extraction layer: batched MC-dropout latent sampling."""

from runia_core_tpu.extraction.adapters import (
    SUPPORTED_OBJECT_DETECTION_ARCHITECTURES,
    DetectionResult,
    postprocess_architecture_taps,
    yolo_get_logits,
)
from runia_core_tpu.extraction.image_level import (
    FastMCDSamplesExtractor,
    ImageLvlFeatureExtractor,
    MCDSamplesExtractor,
    deeplabv3p_get_ls_mcd_samples,
    get_latent_representation_mcd_samples,
)
from runia_core_tpu.extraction.object_level import (
    BoxFeaturesExtractor,
    _dropblock_rois_get_entropy,
    _reduce_features_to_rois,
)
from runia_core_tpu.extraction.object_level_batched import (
    PaddedDetections,
    batched_roi_features,
    build_object_scorer,
    pad_detections,
)
from runia_core_tpu.extraction.hf_adapters import HFDetrAdapter, cxcywh_to_xyxy
from runia_core_tpu.extraction.image_level import _ExtractorBase as Extractor
from runia_core_tpu.extraction.taps import Hook, apply_dropout, tap_flax_model

# Reference name: the architecture-dispatch extractor base
# (abstract_classes.py:249) — BoxFeaturesExtractor plays that role here.
from runia_core_tpu.extraction.object_level import (
    BoxFeaturesExtractor as ObjectDetectionExtractor,
)
from runia_core_tpu.extraction.utils import (
    associate_precalculated_baselines_with_raw_predictions,
    get_aggregated_data_dict,
)

__all__ = [
    "FastMCDSamplesExtractor",
    "ImageLvlFeatureExtractor",
    "MCDSamplesExtractor",
    "get_latent_representation_mcd_samples",
    "BoxFeaturesExtractor",
    "DetectionResult",
    "SUPPORTED_OBJECT_DETECTION_ARCHITECTURES",
    "yolo_get_logits",
    "postprocess_architecture_taps",
    "get_aggregated_data_dict",
    "associate_precalculated_baselines_with_raw_predictions",
    "Hook",
    "apply_dropout",
    "tap_flax_model",
    "Extractor",
    "ObjectDetectionExtractor",
    "deeplabv3p_get_ls_mcd_samples",
    "PaddedDetections",
    "pad_detections",
    "batched_roi_features",
    "build_object_scorer",
    "HFDetrAdapter",
    "cxcywh_to_xyxy",
]
