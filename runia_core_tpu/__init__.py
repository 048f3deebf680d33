"""runia-tpu: TPU-native runtime uncertainty estimation and OoD detection.

A ground-up JAX/XLA/Pallas framework with the capabilities of
CEA-LIST/runia_core (see SURVEY.md): latent-space OoD methods (LaRED / LaREM /
LaREx), 16 post-hoc scorers, image- and object-level feature extraction,
open-set detection evaluation, and LLM hallucination scores — all batch-first,
functional, and jittable.
"""

from runia_core_tpu import config, detectors, ops
from runia_core_tpu.version import __version__

__all__ = ["config", "detectors", "ops", "__version__"]
