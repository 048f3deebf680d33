"""Fused MC-DropBlock+entropy kernel: bit-parity with the two-step path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.ops.entropy import _marginal_entropy_xla
from runia_core_tpu.ops.mc_entropy_pallas import (
    fused_mc_entropy,
    mc_dropblock_weights,
)
from runia_core_tpu.sampling import mc_dropblock_samples


class TestFusedMCEntropy:
    def _two_step(self, key, fmap, s, bs, dp, k):
        mc = mc_dropblock_samples(key, fmap, s, bs, dp, "Conv", channel_axis=3)
        return np.asarray(_marginal_entropy_xla(mc, k))

    def test_bit_parity(self, rng):
        fmap = jnp.asarray(rng.rand(5, 4, 4, 300).astype(np.float32))
        key = jax.random.key(3)
        fused = np.asarray(fused_mc_entropy(key, fmap, 16, 3, 0.5, interpret=True))
        ref = self._two_step(key, fmap, 16, 3, 0.5, 5)
        np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)

    def test_parity_other_config(self, rng):
        fmap = jnp.asarray(rng.rand(3, 8, 8, 64).astype(np.float32))
        key = jax.random.key(11)
        fused = np.asarray(
            fused_mc_entropy(key, fmap, mc_samples=8, block_size=2, drop_prob=0.3,
                             interpret=True)
        )
        ref = self._two_step(key, fmap, 8, 2, 0.3, 5)
        np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)

    def test_weights_match_sampler(self, rng):
        """dropblock2d(ones) recovers exactly the keep*scale weights."""
        key = jax.random.key(5)
        b, h, w, c = 4, 6, 6, 16
        fmap = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
        weights = mc_dropblock_weights(key, b, h, w, 8, 3, 0.5)  # (B, S, HW)
        mc = np.asarray(
            mc_dropblock_samples(key, fmap, 8, 3, 0.5, "Conv", channel_axis=3)
        )  # (B, S, C)
        manual = np.einsum(
            "bsp,bpc->bsc", np.asarray(weights),
            np.asarray(fmap).reshape(b, h * w, c),
        ) / (h * w)
        np.testing.assert_allclose(manual, mc, rtol=1e-4, atol=1e-6)
