"""Entropy path parity: pairwise-XLA vs Pallas kernel vs sorted-window,
across edge shapes.

The Pallas kernel runs in interpreter mode on CPU; the compiled paths are
exercised on TPU by bench.py and the verify drives.
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree
from scipy.special import digamma

import jax.numpy as jnp

from runia_core_tpu.ops.entropy import (
    _marginal_entropy_sorted,
    _marginal_entropy_xla,
    marginal_entropy,
)
from runia_core_tpu.ops.entropy_pallas import marginal_entropy_pallas


def _check(clouds, k, **kw):
    a = np.asarray(_marginal_entropy_xla(jnp.asarray(clouds), k))
    b = np.asarray(marginal_entropy_pallas(jnp.asarray(clouds), k, interpret=True, **kw))
    c = np.asarray(_marginal_entropy_sorted(jnp.asarray(clouds), k))
    # shared digamma constant: paths agree to f32 reduction-order noise
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-6)


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

    def test_dispatch_default_matches_reference_path(self, rng):
        # The default dispatch (sorted-window) must match the pairwise-XLA
        # reference path bit-for-bit modulo reduction order.
        clouds = jnp.asarray(rng.randn(2, 16, 64).astype(np.float32))
        out = marginal_entropy(clouds, 5)
        expected = _marginal_entropy_xla(clouds, 5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)

    def test_sorted_window_matches_ckdtree(self, rng):
        """The default path against the reference's literal formula: scipy
        cKDTree k-th neighbor + digamma constant (entropy_estimators
        semantics, reference evaluation/entropy.py)."""
        n, k = 16, 5
        clouds = rng.randn(4, n, 24).astype(np.float32)
        got = np.asarray(_marginal_entropy_sorted(jnp.asarray(clouds), k))
        for b in range(clouds.shape[0]):
            for d_i in range(clouds.shape[2]):
                col = clouds[b, :, d_i : d_i + 1].astype(np.float64)
                dist = cKDTree(col).query(col, k + 1, p=np.inf)[0][:, -1]
                dist[dist < 1e-5] = 1e-5
                want = -digamma(k) + digamma(n) + np.sum(np.log(2 * dist)) / n
                np.testing.assert_allclose(got[b, d_i], want, rtol=2e-5, atol=2e-5)
