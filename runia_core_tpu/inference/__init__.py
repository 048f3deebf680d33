"""Runtime inference modules (online OoD scoring)."""

from runia_core_tpu.inference.image_level import (
    LaRDInference,
    LaRExInference,
    build_larex_scorer,
)
from runia_core_tpu.inference.object_level import (
    BoxInferenceYolo,
    ObjectLevelInference,
)

__all__ = [
    "LaRExInference",
    "LaRDInference",
    "build_larex_scorer",
    "BoxInferenceYolo",
    "ObjectLevelInference",
]
