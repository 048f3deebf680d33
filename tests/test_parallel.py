"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.detectors.latent import kde_log_density
from runia_core_tpu.ops.knn import squared_l2_kth_neighbor
from runia_core_tpu.parallel import make_mesh, shard_batch
from runia_core_tpu.parallel.sharded import (
    data_parallel_scorer,
    fit_md_sharded,
    sharded_kde_log_density,
    sharded_knn_score,
    sharded_mean_and_covariance,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, model_parallel=1, axis_names=("data", "model"))


class TestShardedMoments:
    def test_mean_cov_match_single_device(self, rng, mesh):
        x = rng.randn(800, 24).astype(np.float32)
        xs = shard_batch(jnp.asarray(x), mesh)
        mean, cov = sharded_mean_and_covariance(xs, mesh)
        np.testing.assert_allclose(np.asarray(mean), x.mean(0), rtol=1e-4, atol=1e-5)
        centered = x - x.mean(0)
        expected_cov = centered.T @ centered / x.shape[0]
        np.testing.assert_allclose(np.asarray(cov), expected_cov, rtol=1e-3, atol=1e-4)

    def test_fit_md_sharded_matches_detector(self, rng, mesh):
        x = rng.randn(800, 16).astype(np.float32)
        test = rng.randn(64, 16).astype(np.float32)
        state = fit_md_sharded(shard_batch(jnp.asarray(x), mesh), mesh)

        md = MDLatentSpace()
        md.setup(x)
        from runia_core_tpu.detectors.latent import md_score

        sharded_scores = np.asarray(
            md_score(jnp.asarray(test), state["feats_mean"], state["precision"])
        )
        np.testing.assert_allclose(
            sharded_scores, md.postprocess(test), rtol=1e-2, atol=1e-2
        )


class TestShardedScoring:
    def test_sharded_kde_matches_dense(self, rng, mesh):
        train = rng.randn(512, 16).astype(np.float32)
        test = rng.randn(32, 16).astype(np.float32)

        @partial(
            shard_map, mesh=mesh, in_specs=(P(None, None), P("data", None)),
            out_specs=P(None),
        )
        def run(t, tr_shard):
            return sharded_kde_log_density(t, tr_shard, n_total=512)

        ours = np.asarray(run(jnp.asarray(test), jnp.asarray(train)))
        expected = np.asarray(kde_log_density(jnp.asarray(test), jnp.asarray(train)))
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)

    def test_sharded_knn_matches_dense(self, rng, mesh):
        train = rng.randn(512, 8).astype(np.float32)
        test = rng.randn(32, 8).astype(np.float32)

        @partial(
            shard_map, mesh=mesh, in_specs=(P(None, None), P("data", None)),
            out_specs=P(None), check_vma=False,
        )
        def run(t, tr_shard):
            return sharded_knn_score(t, tr_shard, k=5)

        ours = -np.asarray(run(jnp.asarray(test), jnp.asarray(train)))
        expected = np.asarray(
            squared_l2_kth_neighbor(jnp.asarray(test), jnp.asarray(train), 5)
        )
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


class TestDataParallelScorer:
    def test_fused_larex_sharded_matches_single(self, rng, mesh):
        """The full fused LaREx program partitions over the data axis and
        produces identical scores."""
        from runia_core_tpu.inference import build_larex_scorer
        from runia_core_tpu.models import SimpleConvNet, build_tapped_forward

        model = SimpleConvNet(num_classes=2, features=8)
        images = rng.rand(16, 16, 16, 1).astype(np.float32)
        variables = model.init(jax.random.key(0), jnp.asarray(images[:2]))
        forward = build_tapped_forward(model, variables)

        md = MDLatentSpace()
        md.setup(rng.randn(100, 16).astype(np.float32))
        scorer = build_larex_scorer(
            forward, pca_state=None, detector_state=md.state,
            mcd_samples_nro=8, drop_block_prob=0.4, drop_block_size=3,
        )
        key = jax.random.key(3)
        _, single = scorer(jnp.asarray(images), key)
        dp = data_parallel_scorer(scorer, mesh)
        _, sharded = dp(jnp.asarray(images), key)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), rtol=1e-4, atol=1e-4
        )

    def test_graft_dryrun(self):
        # One mesh size: the driver calls with a single N, and the second
        # in-process mesh size only re-jitted every leg (~60 s) for
        # coverage the n=8 run already provides. The bare-process variant
        # lives in test_graft_entry.py.
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestInitializeDistributed:
    def test_single_host_noop(self):
        from runia_core_tpu.parallel import initialize_distributed

        n = initialize_distributed()
        assert n == len(jax.devices())
        # Explicit single-process call is also a no-op.
        assert initialize_distributed(num_processes=1) == n


class TestShardedPCA:
    def test_matches_single_device_pca(self, rng, mesh):
        """Distributed covariance-eigh PCA == SVD-based pca_fit: same
        components/variances (sign convention aligned), same projections."""
        from runia_core_tpu.parallel.sharded import fit_pca_sharded
        from runia_core_tpu.reduction import pca_fit, pca_transform

        x = rng.randn(256, 12).astype(np.float32)
        x_sharded = jnp.asarray(x)
        state_sharded = fit_pca_sharded(x_sharded, mesh, n_components=5)
        _, state_single = pca_fit(x, n_components=5, svd_solver="full")

        np.testing.assert_allclose(
            np.asarray(state_sharded.mean), np.asarray(state_single.mean),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(state_sharded.explained_variance),
            np.asarray(state_single.explained_variance),
            rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(state_sharded.components),
            np.asarray(state_single.components),
            rtol=1e-2, atol=1e-3,
        )
        test = jnp.asarray(rng.randn(20, 12).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(pca_transform(state_sharded, test)),
            np.asarray(pca_transform(state_single, test)),
            rtol=5e-2, atol=1e-2,
        )
