"""Timing and profiling utilities.

The reference's observability surface is a single ``record_time`` decorator
plus tqdm bars (SURVEY.md section 5 "Tracing / profiling"). The TPU build
keeps that API (detectors.base.record_time, re-exported here) and adds the
JAX-native pieces: a dispatch-aware steady-state benchmark helper and
``jax.profiler`` trace capture for perfetto/XProf analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax

from runia_core_tpu.detectors.base import record_time

__all__ = [
    "record_time",
    "benchmark",
    "tpu_profile",
    "trace_annotation",
    "profile_taps",
]


def benchmark(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    **kwargs,
):
    """Steady-state timing of a jitted callable.

    Runs ``warmup`` untimed calls (compilation), then ``iters`` timed calls
    with one final ``block_until_ready`` — measuring device execution, not
    async dispatch.

    Returns:
        (last_result, seconds_per_call)
    """
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    start = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return result, (time.perf_counter() - start) / iters


@contextlib.contextmanager
def tpu_profile(log_dir: str = "/tmp/runia_profile", create_perfetto_link: bool = False):
    """Capture a jax.profiler trace around a block of device work.

    Open the resulting directory with XProf/TensorBoard or upload the
    .perfetto-trace to ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def trace_annotation(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def profile_taps(
    model,
    variables,
    images,
    taps: Optional[tuple] = None,
    iters: int = 10,
    warmup: int = 2,
):
    """Per-stage device time of a tapped model's forward.

    For each tap name, jits a truncated forward returning ONLY that tap —
    XLA dead-code-eliminates every later stage — and times it with
    :func:`benchmark`. The delta between successive taps localizes stage
    cost (the method behind the docs/PERFORMANCE.md war tables). ``taps``
    defaults to every tap the model emits (dict key order — pass an
    explicit tuple for stage order).

    Returns:
        {tap_name: seconds_per_call} ordered dict.
    """
    if taps is None:
        _, all_taps = jax.eval_shape(
            lambda v, x: model.apply(v, x), variables, images
        )
        taps = tuple(all_taps.keys())
    results = {}
    for name in taps:
        # Params stay an ordinary device argument (shared across the N tap
        # programs) rather than a closure constant staged into every jaxpr.
        fn = jax.jit(lambda v, x, name=name: model.apply(v, x)[1][name])
        _, dt = benchmark(fn, variables, images, iters=iters, warmup=warmup)
        results[name] = dt
    return results
