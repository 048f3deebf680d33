"""Runtime inference modules (online OoD scoring)."""

from runia_core_tpu.detectors.base import (
    OodPostprocessor,
    Postprocessor,
    get_baselines_thresholds,
    get_method_threshold,
    record_time,
)
from runia_core_tpu.inference.image_level import (
    InferenceModule,
    LaRDInference,
    LaRExInference,
    ObjectDetectionInferenceBase,
    ProbabilisticInferenceModule,
    build_larex_scorer,
)
from runia_core_tpu.inference.segmentation import build_pixel_uncertainty_scorer
from runia_core_tpu.inference.service import ScoringService
from runia_core_tpu.inference.object_level import (
    BoxInferenceYolo,
    ObjectLevelInference,
)

# Reference name: the object-detection inference base class
# (abstract_classes.py:324) — ours carries the "Base" suffix to avoid
# clashing with the concrete ObjectLevelInference.
ObjectDetectionInference = ObjectDetectionInferenceBase

__all__ = [
    "LaRExInference",
    "LaRDInference",
    "build_larex_scorer",
    "build_pixel_uncertainty_scorer",
    "ScoringService",
    "BoxInferenceYolo",
    "ObjectLevelInference",
    "InferenceModule",
    "ProbabilisticInferenceModule",
    "ObjectDetectionInference",
    "ObjectDetectionInferenceBase",
    "Postprocessor",
    "OodPostprocessor",
    "record_time",
    "get_baselines_thresholds",
    "get_method_threshold",
]
