"""Pallas entropy kernel: parity with the XLA path across edge shapes.

Runs in interpreter mode on CPU; the compiled path is exercised on TPU by
bench.py and the verify drives.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from runia_core_tpu.ops.entropy import _marginal_entropy_xla, marginal_entropy
from runia_core_tpu.ops.entropy_pallas import marginal_entropy_pallas


def _check(clouds, k, **kw):
    a = np.asarray(_marginal_entropy_xla(jnp.asarray(clouds), k))
    b = np.asarray(marginal_entropy_pallas(jnp.asarray(clouds), k, interpret=True, **kw))
    # shared digamma constant: paths agree to f32 reduction-order noise
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


class TestPallasEntropyParity:
    def test_standard_shape(self, rng):
        _check(rng.randn(8, 16, 512).astype(np.float32), 5)

    def test_batch_not_multiple_of_8(self, rng):
        _check(rng.randn(5, 16, 128).astype(np.float32), 5)

    def test_d_not_multiple_of_128(self, rng):
        _check(rng.randn(8, 16, 200).astype(np.float32), 5)

    def test_d_smaller_than_lane(self, rng):
        _check(rng.randn(4, 16, 33).astype(np.float32), 5)

    def test_n32(self, rng):
        _check(rng.randn(4, 32, 128).astype(np.float32), 5)

    def test_n_not_multiple_of_8(self, rng):
        _check(rng.randn(4, 12, 128).astype(np.float32), 5)

    def test_small_n_small_k(self, rng):
        _check(rng.randn(4, 5, 64).astype(np.float32), 4)

    def test_duplicates_heavy(self, rng):
        clouds = rng.randn(4, 16, 64).astype(np.float32)
        clouds[:, :10, :32] = 0.0  # many exact duplicates (DropBlock-like)
        _check(clouds, 5)

    def test_all_identical(self):
        clouds = np.ones((2, 16, 64), np.float32)
        _check(clouds, 5)

    def test_tile_d_smaller_than_d(self, rng):
        _check(rng.randn(8, 16, 512).astype(np.float32), 5, tile_d=128)

    def test_single_cloud(self, rng):
        _check(rng.randn(1, 16, 128).astype(np.float32), 5)

    def test_dispatch_uses_xla_on_cpu(self, rng):
        # On the CPU test backend the dispatcher must take the XLA path.
        clouds = jnp.asarray(rng.randn(2, 16, 64).astype(np.float32))
        out = marginal_entropy(clouds, 5)
        expected = _marginal_entropy_xla(clouds, 5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)
