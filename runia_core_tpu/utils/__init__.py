"""Cross-cutting utilities: timing and profiling."""

from runia_core_tpu.utils.profiling import (
    benchmark,
    record_time,
    trace_annotation,
    tpu_profile,
)

__all__ = ["record_time", "benchmark", "tpu_profile", "trace_annotation"]
