"""Failure-detection utilities: healthcheck, finite guards, retries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.utils import (
    HealthCheckError,
    NonFiniteError,
    device_healthcheck,
    find_nonfinite,
    guard_finite,
    with_retries,
)


class TestHealthcheck:
    def test_healthy_device(self):
        latency = device_healthcheck(timeout_s=60.0)
        assert latency > 0

    def test_timeout_raises(self, monkeypatch):
        # Force a slow probe: with warm compile caches the real probe can
        # finish before result(timeout) even checks, making a tiny deadline
        # alone flaky.
        import time as _time

        from runia_core_tpu.utils import health as health_mod

        real_put = health_mod.jax.device_put

        def slow_put(x, device=None):
            _time.sleep(0.5)
            return real_put(x, device)

        monkeypatch.setattr(health_mod.jax, "device_put", slow_put)
        with pytest.raises(HealthCheckError, match="did not answer"):
            device_healthcheck(timeout_s=0.05)


class TestFindNonfinite:
    def test_locates_bad_leaves(self):
        tree = {
            "good": jnp.ones(4),
            "nan": jnp.array([1.0, np.nan, np.inf]),
            "ints": jnp.arange(3),  # non-float leaves are skipped
        }
        bad = find_nonfinite(tree)
        assert list(bad) == ["['nan']"]
        assert bad["['nan']"] == 2

    def test_clean_tree_empty(self):
        assert find_nonfinite({"a": jnp.ones(3), "b": (jnp.zeros(2),)}) == {}


class TestGuardFinite:
    def test_passes_through_clean_outputs(self):
        f = guard_finite(jax.jit(lambda x: (x * 2, x.sum())))
        y, s = f(jnp.ones(4))
        np.testing.assert_array_equal(np.asarray(y), 2 * np.ones(4))

    def test_raises_on_nan(self):
        f = guard_finite(jax.jit(lambda x: jnp.log(x)), name="scores")
        with pytest.raises(NonFiniteError, match="scores"):
            f(jnp.array([1.0, -1.0]))  # log(-1) = nan

    def test_scorer_integration(self, rng):
        """A LaREM scorer with a singular precision (all-zero train data)
        produces NaN scores — the guard turns silence into a signal."""
        from runia_core_tpu.detectors.latent import md_score

        feats = jnp.asarray(rng.randn(4, 8).astype(np.float32))
        bad_precision = jnp.full((8, 8), jnp.nan, jnp.float32)
        scorer = guard_finite(
            lambda x: md_score(x, jnp.zeros((1, 8)), bad_precision),
            name="larem",
        )
        with pytest.raises(NonFiniteError):
            scorer(feats)


class TestWithRetries:
    def test_retries_then_succeeds(self):
        calls = []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise jax.errors.JaxRuntimeError("transient")
            return "ok"

        seen = []
        f = with_retries(
            flaky, retries=3, backoff_s=0.0,
            on_retry=lambda i, e: seen.append(i),
        )
        assert f() == "ok"
        assert len(calls) == 3 and seen == [0, 1]

    def test_exhausted_retries_raise(self):
        def always_fails():
            raise jax.errors.JaxRuntimeError("dead")

        f = with_retries(always_fails, retries=1, backoff_s=0.0)
        with pytest.raises(jax.errors.JaxRuntimeError):
            f()

    def test_semantic_errors_not_retried(self):
        calls = []

        def bad():
            calls.append(1)
            raise NonFiniteError("nan scores")

        f = with_retries(bad, retries=5, backoff_s=0.0)
        with pytest.raises(NonFiniteError):
            f()
        assert len(calls) == 1
