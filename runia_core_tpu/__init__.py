"""runia-tpu: TPU-native runtime uncertainty estimation and OoD detection.

A ground-up JAX/XLA/Pallas framework with the capabilities of
CEA-LIST/runia_core (see SURVEY.md): latent-space OoD methods (LaRED / LaREM /
LaREx), 16 post-hoc scorers, image- and object-level feature extraction,
open-set detection evaluation, LLM hallucination scores, and mesh-sharded
execution — all batch-first, functional, and jittable.

Sub-package layout mirrors the reference (reference runia_core/__init__.py)
with the same deprecation machinery; ``reduction`` plays the role of the
reference's ``dimensionality_reduction`` and is aliased accordingly.
"""

from runia_core_tpu import (
    checkpoint,
    config,
    detectors,
    evaluation,
    extraction,
    inference,
    llm,
    models,
    ops,
    parallel,
    rcnn,
    reduction,
    sampling,
    yolov8,
)
from runia_core_tpu import reduction as dimensionality_reduction
from runia_core_tpu import llm as llm_uncertainty
from runia_core_tpu import extraction as feature_extraction
from runia_core_tpu.import_helper_functions import module_exists
from runia_core_tpu.reduction import (
    apply_pca_ds,
    apply_pca_ds_split,
    apply_pca_transform,
    apply_pacmap_transform,
    fit_pacmap,
    plot_samples_pacmap,
)
from runia_core_tpu.version import __version__

__all__ = [
    "evaluation",
    "feature_extraction",
    "extraction",
    "inference",
    "yolov8",
    "rcnn",
    "llm_uncertainty",
    "llm",
    "detectors",
    "models",
    "ops",
    "parallel",
    "reduction",
    "dimensionality_reduction",
    "sampling",
    "config",
    "checkpoint",
    "module_exists",
    "apply_pca_ds",
    "apply_pca_ds_split",
    "apply_pca_transform",
    "fit_pacmap",
    "apply_pacmap_transform",
    "plot_samples_pacmap",
    "__version__",
]

# Deprecated / expired attribute machinery: maps old attribute names either
# to a replacement value + message (deprecated) or to a message only
# (expired — accessing returns a stub that raises).
__deprecated_attrs__: dict = {}
__expired_functions__: dict = {}


def __getattr__(attr):  # pragma: no cover
    import warnings

    if attr in __expired_functions__:
        message = __expired_functions__[attr]
        warnings.warn(message, DeprecationWarning, stacklevel=2)

        def _expired(*_args, **_kwargs):
            raise RuntimeError(message)

        return _expired

    if attr in __deprecated_attrs__:
        value, message = __deprecated_attrs__[attr]
        warnings.warn(message, DeprecationWarning, stacklevel=2)
        return value

    raise AttributeError(f"module {__name__!r} has no attribute {attr!r}")
