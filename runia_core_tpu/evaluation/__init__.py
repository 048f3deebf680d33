"""Evaluation layer: entropy engine, metrics, baselines, benchmark harness."""

from runia_core_tpu.evaluation.entropy import (
    get_dl_h_z,
    neighbors_for,
    single_image_entropy_calculation,
)

__all__ = ["get_dl_h_z", "single_image_entropy_calculation", "neighbors_for"]
