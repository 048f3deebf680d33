"""Feature extraction layer: batched MC-dropout latent sampling."""

from runia_core_tpu.extraction.image_level import (
    FastMCDSamplesExtractor,
    MCDSamplesExtractor,
    get_latent_representation_mcd_samples,
)

__all__ = [
    "FastMCDSamplesExtractor",
    "MCDSamplesExtractor",
    "get_latent_representation_mcd_samples",
]
