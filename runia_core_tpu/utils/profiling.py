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
    "sync",
    "tpu_profile",
    "trace_annotation",
    "profile_taps",
    "enable_compilation_cache",
]


def enable_compilation_cache(
    cache_dir: str = "~/.cache/runia_tpu_xla",
    min_compile_time_secs: float = 1.0,
) -> str:
    """Persist XLA compilations to disk so repeat runs skip them entirely.

    Every new jitted shape costs a full compile — 30-60 s over a tunneled
    TPU — and that cost recurs on every process start without this cache.
    One call at program start makes every later run of the same program
    (bench sweeps, serving restarts, notebook re-executions) hit the disk
    cache instead. Only compilations slower than ``min_compile_time_secs``
    are stored (tiny programs re-compile faster than they deserialize).

    Returns the resolved cache directory.
    """
    import os

    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_time_secs),
    )
    # Cache regardless of backend identity quirks (the tunneled-TPU plugin
    # reports an experimental platform; "all" opts it in explicitly).
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    return path


def sync(result) -> None:
    """Force completion of every enqueued device call.

    ``jax.block_until_ready`` on a tunneled (remote-TPU) array returns at
    ENQUEUE, not at completion — timings built on it measure dispatch, not
    execution (measured 2026-08-18: 20 identical 5.6 ms matmul calls
    "block" in 0.8 ms total). A host fetch, by contrast, drains the
    device's FIFO execution queue — even a fetch of an unrelated tiny
    buffer — so we fetch one element of one result leaf (the slice runs on
    device; only ~4 bytes cross the tunnel).

    Only ``jax.Array`` leaves qualify: ``device_get`` on a host numpy
    array returns instantly without touching the device, so a result tree
    whose first leaf is numpy would silently skip the drain and reintroduce
    the enqueue-time bug this function exists to fix."""
    leaves = [
        l for l in jax.tree_util.tree_leaves(result) if isinstance(l, jax.Array)
    ]
    if not leaves:
        jax.block_until_ready(result)
        return
    jax.device_get(leaves[0].ravel()[:1])


_sync = sync  # internal alias, kept for existing callers


def benchmark(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    windows: int = 3,
    **kwargs,
):
    """Steady-state timing of a jitted callable.

    Runs ``warmup`` untimed calls (compilation), then times two enqueue
    windows of ``iters`` and ``2*iters`` calls, each drained by a single
    tiny host fetch (see :func:`sync`), and reports the MARGINAL cost
    ``(t2 - t1) / iters`` — the fixed costs (RTT, queue drain latency,
    fetch) cancel, leaving per-call device execution time. The window pair
    is repeated ``windows`` times and the MEDIAN marginal wins.

    ``iters`` auto-escalates (x4, bounded) until the extra window's total
    device work is resolvable over the tunnel: if iters x per-call time is
    below the fetch RTT, the extra calls finish while the drain fetch is
    still in flight and the marginal measures ~0 REGARDLESS of repeats
    (measured: 5x an 86 us matmul -> t2 <= t1 systematically; 80x -> the
    true per-call time). Callers pass ``iters`` as a starting point, not a
    contract. Validated against a known-FLOPs bf16 matmul chain (5.97 ms
    measured vs 5.58 ms roofline on v5e over the axon tunnel).

    Returns:
        (last_result, seconds_per_call)

    ``warmup`` is clamped to >= 1: the marginal-window method needs
    compilation to happen OUTSIDE the timed windows — with warmup=0 the
    first window would absorb the 30-60 s tunnel compile, t2 - t1 would go
    negative, and the clamp would report ~0 s/call.
    """
    result = None
    for _ in range(max(warmup, 1)):
        result = fn(*args, **kwargs)
    _sync(result)

    def window(n: int) -> float:
        start = time.perf_counter()
        res = None
        for _ in range(n):
            res = fn(*args, **kwargs)
        _sync(res)
        return time.perf_counter() - start

    # The marginal is trustworthy once the extra window represents more
    # device time than sync-fetch jitter; below that floor, escalate iters
    # instead of returning a jitter sample. The floor scales with the
    # measured drain RTT so a fast local/CPU backend (RTT ~us) doesn't pay
    # the tunnel's ~ms floor via a 1024x iters escalation.
    rtt_start = time.perf_counter()
    _sync(result)
    fetch_rtt = time.perf_counter() - rtt_start
    resolvable_s = min(max(20.0 * fetch_rtt, 2e-4), 4e-3)
    iters = max(iters, 1)
    for _ in range(6):  # bounded: worst case 1024x the requested iters
        marginals = []
        for _ in range(max(windows, 1)):
            t1 = window(iters)
            t2 = window(2 * iters)
            marginals.append(max(t2 - t1, 1e-9) / iters)
        marginals.sort()
        med = marginals[len(marginals) // 2]
        if med * iters >= resolvable_s:
            break
        iters *= 4
    else:
        import warnings

        warnings.warn(
            f"benchmark(): timed window never reached the resolvability "
            f"floor ({med * iters:.2e} s < {resolvable_s:.2e} s after "
            f"escalating to iters={iters}); the returned per-call time is "
            f"jitter-dominated and likely overstated.",
            stacklevel=2,
        )
    return result, med


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
