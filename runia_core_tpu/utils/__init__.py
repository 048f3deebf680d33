"""Cross-cutting utilities: timing, profiling, and failure detection."""

from runia_core_tpu.utils.health import (
    HealthCheckError,
    NonFiniteError,
    device_healthcheck,
    find_nonfinite,
    guard_finite,
    with_retries,
)
from runia_core_tpu.utils.profiling import (
    benchmark,
    enable_compilation_cache,
    profile_taps,
    record_time,
    trace_annotation,
    tpu_profile,
)

__all__ = [
    "record_time",
    "benchmark",
    "tpu_profile",
    "trace_annotation",
    "profile_taps",
    "enable_compilation_cache",
    "HealthCheckError",
    "NonFiniteError",
    "device_healthcheck",
    "find_nonfinite",
    "guard_finite",
    "with_retries",
]
