"""Failure detection for production serving.

The reference has no runtime health machinery (scores silently go NaN if a
fitted covariance is singular, and a wedged device hangs the process). These
utilities make failure modes explicit:

- :func:`device_healthcheck` — prove a device can still compile+execute+
  round-trip within a deadline (a wedged TPU runtime otherwise blocks
  forever on the first collective).
- :func:`guard_finite` — wrap a scorer so non-finite outputs raise
  :class:`NonFiniteError` naming the offending output instead of flowing
  into thresholds (NaN compares false against any threshold, which silently
  marks every sample in-distribution).
- :func:`find_nonfinite` — locate NaN/inf leaves in a pytree (fitted
  detector states, gradients) for diagnostics.
- :func:`with_retries` — exponential-backoff retry for transient device
  errors around a serving call.
"""

from __future__ import annotations

import concurrent.futures
import time
from typing import Callable, Dict, Optional, Sequence, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "HealthCheckError",
    "NonFiniteError",
    "device_healthcheck",
    "guard_finite",
    "find_nonfinite",
    "with_retries",
]


class HealthCheckError(RuntimeError):
    """A device failed to execute the probe within the deadline."""


class NonFiniteError(ValueError):
    """A guarded function produced NaN/inf outputs."""


def device_healthcheck(
    device=None, timeout_s: float = 300.0, size: int = 128
) -> float:
    """Run a tiny matmul probe on ``device`` and validate the result.

    Returns the *steady-state* round-trip latency in seconds (the probe runs
    twice; the first execution pays backend init + compile, which on remote/
    tunneled devices can take minutes — the deadline must cover it, hence
    the generous default). Raises :class:`HealthCheckError` if the probe
    does not complete in ``timeout_s`` (wedged runtime) or returns wrong
    numbers (corrupted state).
    """
    if device is None:
        device = jax.devices()[0]

    def probe():
        x = jax.device_put(jnp.eye(size, dtype=jnp.float32) * 2.0, device)
        float((x @ x).sum())  # init + compile + first round trip
        t0 = time.perf_counter()
        y = float((x @ x).sum())
        return y, time.perf_counter() - t0

    # No `with` block: exiting the context would shutdown(wait=True) and
    # join a worker still blocked inside a wedged TPU runtime — the
    # healthcheck would then hang on exactly the failure it exists to
    # detect. Abandon the stuck thread instead (wait=False).
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    future = pool.submit(probe)
    try:
        result, latency = future.result(timeout=timeout_s)
    except concurrent.futures.TimeoutError as exc:
        pool.shutdown(wait=False)
        raise HealthCheckError(
            f"device {device} did not answer the probe within {timeout_s}s"
        ) from exc
    pool.shutdown(wait=False)
    expected = 4.0 * size
    if abs(result - expected) > 1e-3 * expected:
        raise HealthCheckError(
            f"device {device} probe returned {result}, expected {expected}"
        )
    return latency


def find_nonfinite(tree) -> Dict[str, int]:
    """Map of pytree-leaf path -> count of non-finite elements (only paths
    with at least one)."""
    bad = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        n = int((~np.isfinite(arr)).sum())
        if n:
            bad[jax.tree_util.keystr(path)] = n
    return bad


def guard_finite(fn: Callable, name: str = "output") -> Callable:
    """Wrap ``fn`` so any non-finite value in its outputs raises
    :class:`NonFiniteError` (with per-output counts) instead of propagating.

    The finiteness reduction runs on device; only one boolean per output
    leaf crosses to the host, so the guard costs almost nothing on top of
    the wrapped program.
    """

    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        flags = [
            bool(jnp.isfinite(leaf).all())
            for leaf in jax.tree_util.tree_leaves(out)
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
        ]
        if not all(flags):
            raise NonFiniteError(
                f"{name}: non-finite values in {find_nonfinite(out)}"
            )
        return out

    return wrapped


def with_retries(
    fn: Callable,
    retries: int = 2,
    backoff_s: float = 0.5,
    retry_on: Tuple[Type[BaseException], ...] = (jax.errors.JaxRuntimeError,),
    on_retry: Optional[Callable[[int, BaseException], None]] = None,
) -> Callable:
    """Retry ``fn`` on transient device errors with exponential backoff.

    ``NonFiniteError`` and other semantic failures are never retried —
    retrying a deterministic program on the same inputs cannot fix them.
    """

    def wrapped(*args, **kwargs):
        attempt = 0
        while True:
            try:
                return fn(*args, **kwargs)
            except retry_on as exc:
                if attempt >= retries:
                    raise
                if on_retry is not None:
                    on_retry(attempt, exc)
                time.sleep(backoff_s * (2 ** attempt))
                attempt += 1

    return wrapped
