"""Parity tests for the KL entropy estimator, DropBlock, and MC sampler.

The entropy estimator is validated against a direct scipy cKDTree
re-implementation of the `entropy_estimators.continuous.get_h` formula the
reference calls (max-norm Kozachenko-Leonenko, min_dist clamp) — the package
itself is not installable here, but the formula is fixed and documented
(reference runia_core/evaluation/entropy.py:35,68).
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree
from scipy.special import digamma

import jax
import jax.numpy as jnp

from runia_core_tpu.evaluation.entropy import get_dl_h_z, neighbors_for
from runia_core_tpu.ops.dropblock import dropblock2d, dropout
from runia_core_tpu.ops.entropy import joint_entropy, kl_entropy, marginal_entropy
from runia_core_tpu.ops.reductions import (
    get_mean_or_fullmean_ls_sample,
    get_std_ls_sample,
    get_variance_ls_sample,
)
from runia_core_tpu.sampling import MCSamplerModule, mc_dropblock_samples


def reference_get_h(x, k, norm="max", min_dist=0.0):
    """scipy re-implementation of entropy_estimators.continuous.get_h."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    assert norm == "max"
    log_c_d = 0.0
    kdtree = cKDTree(x)
    distances, _ = kdtree.query(x, k + 1, eps=0, p=np.inf)
    distances = distances[:, -1]
    distances[distances < min_dist] = min_dist
    sum_log_dist = np.sum(np.log(2 * distances))
    return -digamma(k) + digamma(n) + log_c_d + (d / float(n)) * sum_log_dist


class TestKLEntropy:
    def test_joint_matches_ckdtree(self, rng):
        cloud = rng.randn(16, 32).astype(np.float32)
        ours = float(kl_entropy(jnp.asarray(cloud), k=5, min_dist=1e-5))
        expected = reference_get_h(cloud, k=5, min_dist=1e-5)
        assert ours == pytest.approx(expected, rel=1e-4)

    def test_joint_batched_matches_single(self, rng):
        clouds = rng.randn(7, 16, 40).astype(np.float32)
        batched = np.asarray(joint_entropy(jnp.asarray(clouds), k=5))
        for i in range(7):
            expected = reference_get_h(clouds[i], k=5, min_dist=1e-5)
            assert batched[i] == pytest.approx(expected, rel=1e-4)

    def test_marginal_matches_ckdtree(self, rng):
        clouds = rng.randn(3, 16, 12).astype(np.float32)
        ours = np.asarray(marginal_entropy(jnp.asarray(clouds), k=5))
        for b in range(3):
            for dim in range(12):
                expected = reference_get_h(clouds[b, :, dim], k=5, min_dist=1e-5)
                assert ours[b, dim] == pytest.approx(expected, rel=1e-4), (b, dim)

    def test_min_dist_clamp(self):
        # Duplicate points force zero kth-NN distances -> clamped to 1e-5.
        cloud = np.zeros((8, 4), dtype=np.float32)
        ours = float(kl_entropy(jnp.asarray(cloud), k=5, min_dist=1e-5))
        expected = reference_get_h(cloud, k=5, min_dist=1e-5)
        assert ours == pytest.approx(expected, rel=1e-5)

    def test_small_n_neighbor_rule(self):
        assert neighbors_for(32) == 5
        assert neighbors_for(6) == 5
        assert neighbors_for(5) == 4
        assert neighbors_for(3) == 2

    def test_get_dl_h_z_shapes_and_values(self, rng):
        n_img, s, d = 5, 8, 10
        stacked = rng.randn(n_img * s, d).astype(np.float32)
        h_z, h_z_i = get_dl_h_z(stacked, mcd_samples_nro=s)
        assert h_z.shape == (n_img, 1)
        assert h_z_i.shape == (n_img, d)
        for i in range(n_img):
            cloud = stacked[i * s : (i + 1) * s]
            assert h_z[i, 0] == pytest.approx(
                reference_get_h(cloud, k=5, min_dist=1e-5), rel=1e-4
            )
            assert h_z_i[i, 0] == pytest.approx(
                reference_get_h(cloud[:, 0], k=5, min_dist=1e-5), rel=1e-4
            )


class TestDropBlock:
    def test_matches_torch_package_semantics(self, rng):
        """Replicate the dropblock package's forward with a shared mask.

        Parity holds per image (the reference only ever runs B == 1,
        abstract_classes.py:237-246). Our batched normalization is
        deliberately per-image — a torch-style global scale would couple
        each image's scores to its batchmates' masks (see dropblock.py).
        """
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        x = rng.rand(2, 3, 12, 12).astype(np.float32)
        key = jax.random.key(42)
        block_size, drop_prob = 3, 0.3
        ours = np.asarray(
            dropblock2d(key, jnp.asarray(x), drop_prob, block_size, channel_axis=1)
        )

        # Recover the seed mask JAX drew, then apply the torch-side pipeline
        # image by image (B == 1 each): exact parity with the package.
        gamma = drop_prob / block_size**2
        seed_mask = np.asarray(
            jax.random.bernoulli(key, gamma, (2, 12, 12))
        ).astype(np.float32)
        for i in range(2):
            mask_t = torch.from_numpy(seed_mask[i : i + 1])
            block_mask = F.max_pool2d(
                mask_t[:, None, :, :],
                kernel_size=(block_size, block_size),
                stride=(1, 1),
                padding=block_size // 2,
            )
            block_mask = 1 - block_mask.squeeze(1)
            out = torch.from_numpy(x[i : i + 1]) * block_mask[:, None, :, :]
            expected = (out * block_mask.numel() / block_mask.sum()).numpy()
            np.testing.assert_allclose(ours[i : i + 1], expected, rtol=1e-5, atol=1e-6)

    def test_batch_composition_independence(self, rng):
        """Each image's output must not depend on its batchmates."""
        x = rng.rand(4, 3, 12, 12).astype(np.float32)
        key = jax.random.key(7)
        full = np.asarray(
            dropblock2d(key, jnp.asarray(x), 0.3, 3, channel_axis=1)
        )
        # The same images through the same per-image masks: recover each
        # image's mask by applying the full batch key to ones.
        ones = np.asarray(
            dropblock2d(key, jnp.ones_like(jnp.asarray(x)), 0.3, 3, channel_axis=1)
        )
        np.testing.assert_allclose(full, x * ones, rtol=1e-5, atol=1e-6)

    def test_even_block_size_shape(self, rng):
        x = jnp.asarray(rng.rand(1, 2, 9, 9).astype(np.float32))
        out = dropblock2d(jax.random.key(0), x, 0.2, 4, channel_axis=1)
        assert out.shape == x.shape

    def test_zero_prob_identity(self, rng):
        x = jnp.asarray(rng.rand(1, 2, 8, 8).astype(np.float32))
        out = dropblock2d(jax.random.key(0), x, 0.0, 3)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_drop_fraction_statistics(self):
        # With drop_prob=0.3, roughly 30% of activations are zeroed.
        x = jnp.ones((8, 4, 32, 32))
        out = dropblock2d(jax.random.key(3), x, 0.3, 3)
        frac = float(np.mean(np.asarray(out) == 0.0))
        assert 0.15 < frac < 0.45

    def test_dropout_matches_torch_semantics(self, rng):
        x = jnp.asarray(rng.rand(100, 50).astype(np.float32))
        out = np.asarray(dropout(jax.random.key(1), x, 0.5))
        kept = out != 0
        # Survivors are scaled by 1/(1-p)
        np.testing.assert_allclose(out[kept], np.asarray(x)[kept] * 2.0, rtol=1e-6)
        assert 0.35 < kept.mean() < 0.65


class TestReductions:
    def test_fullmean_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.rand(1, 8, 6, 7).astype(np.float32)
        ours = np.asarray(get_mean_or_fullmean_ls_sample(jnp.asarray(x), "fullmean"))
        t = torch.from_numpy(x)
        expected = torch.squeeze(
            torch.mean(torch.mean(t, dim=3, keepdim=True), dim=2, keepdim=True)
        ).numpy()
        np.testing.assert_allclose(ours[0], expected, rtol=1e-6)

    def test_mean_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.rand(1, 8, 6, 7).astype(np.float32)
        ours = np.asarray(get_mean_or_fullmean_ls_sample(jnp.asarray(x), "mean"))
        expected = torch.squeeze(
            torch.mean(torch.from_numpy(x), dim=3, keepdim=True)
        ).numpy()
        np.testing.assert_allclose(ours[0], expected, rtol=1e-6)

    def test_std_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.rand(1, 8, 6, 7).astype(np.float32)
        ours = np.asarray(get_std_ls_sample(jnp.asarray(x)))
        t = torch.from_numpy(x)
        expected = torch.squeeze(
            torch.std(torch.std(t, dim=3, keepdim=True), dim=2, keepdim=True)
        ).numpy()
        np.testing.assert_allclose(ours[0], expected, rtol=1e-5)

    def test_var_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.rand(1, 8, 6, 7).astype(np.float32)
        ours = np.asarray(get_variance_ls_sample(jnp.asarray(x)))
        t = torch.from_numpy(x)
        expected = torch.squeeze(
            torch.var(torch.var(t, dim=3, keepdim=True), dim=2, keepdim=True)
        ).numpy()
        np.testing.assert_allclose(ours[0], expected, rtol=1e-5)


class TestMCSampler:
    def test_shapes_conv(self, rng):
        x = jnp.asarray(rng.rand(1, 16, 10, 10).astype(np.float32))
        sampler = MCSamplerModule(mc_samples=8, block_size=3, drop_prob=0.4)
        out = sampler(x, jax.random.key(0))
        assert out.shape == (8, 16)

    def test_shapes_fc(self, rng):
        x = jnp.asarray(rng.rand(1, 4, 5, 5).astype(np.float32))
        sampler = MCSamplerModule(8, 3, 0.4, layer_type="FC")
        out = sampler(x, jax.random.key(0))
        assert out.shape == (8, 100)

    def test_batched(self, rng):
        x = jnp.asarray(rng.rand(6, 16, 10, 10).astype(np.float32))
        out = mc_dropblock_samples(jax.random.key(0), x, 8, 3, 0.4)
        assert out.shape == (6, 8, 16)

    def test_samples_differ_across_mc_axis(self, rng):
        x = jnp.asarray(rng.rand(1, 16, 10, 10).astype(np.float32))
        out = np.asarray(MCSamplerModule(8, 3, 0.5)(x, jax.random.key(0)))
        assert not np.allclose(out[0], out[1])

    def test_deterministic_given_key(self, rng):
        x = jnp.asarray(rng.rand(1, 16, 10, 10).astype(np.float32))
        sampler = MCSamplerModule(4, 3, 0.5)
        a = np.asarray(sampler(x, jax.random.key(7)))
        b = np.asarray(sampler(x, jax.random.key(7)))
        np.testing.assert_array_equal(a, b)

    def test_end_to_end_sampler_entropy(self, rng):
        """Sampler output feeds get_dl_h_z exactly like the reference flow."""
        x = jnp.asarray(rng.rand(1, 16, 10, 10).astype(np.float32))
        sampler = MCSamplerModule(16, 3, 0.5)
        samples = sampler(x, jax.random.key(0))  # (16, 16)
        h_z, h_z_i = get_dl_h_z(np.asarray(samples), mcd_samples_nro=16)
        assert h_z.shape == (1, 1)
        assert h_z_i.shape == (1, 16)
        assert np.isfinite(h_z_i).all()


class TestLayoutInterchangeability:
    def test_nhwc_mean_matches_nchw_ordering(self):
        """NHWC 'mean' reduction must emit features in the same C-major
        ordering as the NCHW path, so fitted detector state transfers across
        layouts (ADVICE r2)."""
        from runia_core_tpu.sampling import mc_dropblock_samples

        rng = np.random.default_rng(7)
        x_nchw = jnp.asarray(rng.standard_normal((2, 5, 6, 6)).astype(np.float32))
        x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
        key = jax.random.key(11)
        a = mc_dropblock_samples(key, x_nchw, 4, 3, 0.4, "Conv",
                                 reduction="mean", channel_axis=1)
        b = mc_dropblock_samples(key, x_nhwc, 4, 3, 0.4, "Conv",
                                 reduction="mean", channel_axis=3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
