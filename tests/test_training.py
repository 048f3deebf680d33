"""Training utilities: convergence on toy data, BatchNorm threading, and the
full train -> tap -> LaREx story."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.models import ResNet, SimpleConvNet, build_tapped_forward
from runia_core_tpu.models.resnet import ResNetBlock
from runia_core_tpu.training import create_train_state, fit_classifier, make_train_step


def two_blob_data(rng, n=128, img=12):
    labels = rng.randint(0, 2, n)
    imgs = rng.rand(n, img, img, 1).astype(np.float32) * 0.2
    for i, lab in enumerate(labels):
        sl = slice(1, 5) if lab == 0 else slice(7, 11)
        imgs[i, sl, sl, 0] += 1.0
    return imgs, labels


class TestTraining:
    def test_convergence_simple(self, rng):
        model = SimpleConvNet(num_classes=2, features=8)
        x, y = two_blob_data(rng)
        loader = [(x, y)]
        variables, metrics = fit_classifier(
            model, loader, jax.random.key(0), jnp.asarray(x[:2]), epochs=25,
            learning_rate=5e-3,
        )
        assert metrics["accuracy"] > 0.9, metrics

    def test_batchnorm_stats_updated(self, rng):
        model = ResNet(
            stage_sizes=(1,), block_cls=ResNetBlock, num_classes=2,
            num_filters=8, cifar_stem=True,
        )
        x, y = two_blob_data(rng, n=32)
        state, tx = create_train_state(model, jax.random.key(0), jnp.asarray(x[:2]))
        before = jax.tree_util.tree_leaves(state.extra_variables["batch_stats"])[0]
        step = make_train_step(model, tx)
        state, metrics = step(state, jnp.asarray(x), jnp.asarray(y))
        after = jax.tree_util.tree_leaves(state.extra_variables["batch_stats"])[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))
        assert np.isfinite(float(metrics["loss"]))

    def test_train_then_larex(self, rng):
        """The full in-framework story: train -> tap -> entropy -> LaREM."""
        from runia_core_tpu.detectors import MDLatentSpace
        from runia_core_tpu.evaluation import get_dl_h_z
        from runia_core_tpu.extraction import FastMCDSamplesExtractor

        model = SimpleConvNet(num_classes=2, features=8)
        x, y = two_blob_data(rng)
        variables, _ = fit_classifier(
            model, [(x, y)], jax.random.key(0), jnp.asarray(x[:2]), epochs=10,
            learning_rate=5e-3,
        )
        forward = build_tapped_forward(model, variables)
        extractor = FastMCDSamplesExtractor(
            model=forward, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=8, dropblock_probs=0.4, dropblock_sizes=3,
        )
        out = extractor.get_ls_samples([(x[:64], y[:64])])
        _, h_z = get_dl_h_z(out["latent_space_means"], 8)
        md = MDLatentSpace()
        md.setup(h_z)
        assert np.isfinite(md.postprocess(h_z)).all()


class TestGradientAccumulation:
    def test_accum_matches_full_batch(self, rng):
        """4-way accumulation == single full-batch step exactly (no-BN model,
        SGD, equal microbatches)."""
        import optax

        from runia_core_tpu.models import SimpleConvNet
        from runia_core_tpu.training import create_train_state, make_train_step

        model = SimpleConvNet(num_classes=3, features=4)
        images = jnp.asarray(rng.rand(16, 16, 16, 3).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 3, 16), jnp.int32)
        tx = optax.sgd(0.1)

        state1, _ = create_train_state(model, jax.random.key(0), images[:1], tx=tx)
        state4, _ = create_train_state(model, jax.random.key(0), images[:1], tx=tx)
        step1 = make_train_step(model, tx)
        step4 = make_train_step(model, tx, accum_steps=4)
        state1, m1 = step1(state1, images, labels)
        state4, m4 = step4(state4, images, labels)

        assert float(m1["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-6)
        assert float(m1["accuracy"]) == pytest.approx(float(m4["accuracy"]))
        for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                        jax.tree_util.tree_leaves(state4.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_accum_with_batchnorm_runs(self, rng):
        import optax

        from runia_core_tpu.models import ResNet
        from runia_core_tpu.models.resnet import ResNetBlock
        from runia_core_tpu.training import create_train_state, make_train_step

        model = ResNet(stage_sizes=(1,), block_cls=ResNetBlock, num_classes=3,
                       num_filters=4, cifar_stem=True, remat=True)
        images = jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 3, 8), jnp.int32)
        tx = optax.sgd(0.1)
        state, _ = create_train_state(model, jax.random.key(0), images[:1], tx=tx)
        step = make_train_step(model, tx, accum_steps=2)
        state, metrics = step(state, images, labels)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1

    def test_indivisible_batch_rejected(self, rng):
        import optax

        from runia_core_tpu.models import SimpleConvNet
        from runia_core_tpu.training import create_train_state, make_train_step

        model = SimpleConvNet(num_classes=2, features=4)
        images = jnp.asarray(rng.rand(6, 16, 16, 3).astype(np.float32))
        labels = jnp.zeros(6, jnp.int32)
        tx = optax.sgd(0.1)
        state, _ = create_train_state(model, jax.random.key(0), images[:1], tx=tx)
        step = make_train_step(model, tx, accum_steps=4)
        with pytest.raises(AssertionError):
            step(state, images, labels)
