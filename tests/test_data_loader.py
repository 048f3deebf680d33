"""Native data-path kernel + prefetch loader tests."""

import numpy as np
import pytest

from runia_core_tpu.data import HAVE_NATIVE, PrefetchLoader, gather_normalize


class TestGatherNormalize:
    def test_parity_with_numpy(self, rng):
        imgs = rng.randint(0, 256, (100, 16, 16, 3)).astype(np.uint8)
        idx = rng.choice(100, 32, replace=False)
        out = gather_normalize(imgs, idx)
        expected = imgs[idx].astype(np.float32) / 255.0
        np.testing.assert_allclose(out, expected, atol=1e-7)

    def test_bgr_flip(self, rng):
        imgs = rng.randint(0, 256, (10, 8, 8, 3)).astype(np.uint8)
        idx = np.arange(10)
        out = gather_normalize(imgs, idx, bgr_to_rgb=True)
        expected = imgs.astype(np.float32)[..., ::-1] / 255.0
        np.testing.assert_allclose(out, expected, atol=1e-7)

    def test_scale_offset(self, rng):
        imgs = rng.randint(0, 256, (10, 8, 8, 1)).astype(np.uint8)
        out = gather_normalize(imgs, np.arange(10), scale=2.0, offset=-1.0)
        expected = imgs.astype(np.float32) * 2.0 - 1.0
        np.testing.assert_allclose(out, expected, atol=1e-6)

    @pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
    def test_native_multithreaded(self, rng):
        imgs = rng.randint(0, 256, (200, 16, 16, 3)).astype(np.uint8)
        idx = rng.choice(200, 64, replace=False)
        out1 = gather_normalize(imgs, idx, num_threads=1)
        out4 = gather_normalize(imgs, idx, num_threads=4)
        np.testing.assert_array_equal(out1, out4)

    @pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
    def test_index_out_of_range(self, rng):
        from runia_core_tpu import _native

        imgs = rng.randint(0, 256, (10, 4, 4, 1)).astype(np.uint8)
        out = np.empty((1, 16), np.float32)
        with pytest.raises(IndexError):
            _native.gather_normalize(
                imgs.reshape(10, -1), np.array([99], np.int64), 10, 16, 1,
                1.0, 0.0, 0, 1, out,
            )


class TestPrefetchLoader:
    def test_iteration_and_shapes(self, rng):
        imgs = rng.randint(0, 256, (90, 8, 8, 3)).astype(np.uint8)
        labels = np.arange(90)
        loader = PrefetchLoader(imgs, labels, batch_size=32, device_put=False)
        batches = list(loader)
        assert len(batches) == 3 == len(loader)
        assert batches[0][0].shape == (32, 8, 8, 3)
        assert batches[2][0].shape == (26, 8, 8, 3)  # remainder kept
        np.testing.assert_array_equal(batches[0][1], np.arange(32))

    def test_drop_remainder(self, rng):
        imgs = rng.randint(0, 256, (90, 8, 8, 3)).astype(np.uint8)
        loader = PrefetchLoader(imgs, batch_size=32, drop_remainder=True,
                                device_put=False)
        assert len(list(loader)) == 2 == len(loader)

    def test_shuffle_deterministic_per_epoch(self, rng):
        imgs = rng.randint(0, 256, (64, 4, 4, 1)).astype(np.uint8)
        labels = np.arange(64)
        loader = PrefetchLoader(imgs, labels, batch_size=64, shuffle=True,
                                seed=3, device_put=False)
        first_epoch = list(loader)[0][1].copy()
        second_epoch = list(loader)[0][1].copy()
        assert not np.array_equal(first_epoch, np.arange(64))
        assert not np.array_equal(first_epoch, second_epoch)  # epoch-folded seed

    def test_producer_exception_propagates(self, rng):
        imgs = rng.randint(0, 256, (16, 4, 4, 1)).astype(np.uint8)
        loader = PrefetchLoader(imgs, batch_size=8, device_put=False)
        loader._index_batches = lambda: (_ for _ in ()).throw(RuntimeError("boom"))
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)

    def test_feeds_extractor(self, rng):
        import jax, jax.numpy as jnp
        from runia_core_tpu.extraction import FastMCDSamplesExtractor
        from runia_core_tpu.models import SimpleConvNet, build_tapped_forward

        model = SimpleConvNet(num_classes=2, features=4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        forward = build_tapped_forward(model, variables)
        imgs = rng.randint(0, 256, (32, 16, 16, 3)).astype(np.uint8)
        loader = PrefetchLoader(imgs, np.zeros(32), batch_size=16)
        extractor = FastMCDSamplesExtractor(
            model=forward, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=4, dropblock_probs=0.3, dropblock_sizes=3,
        )
        out = extractor.get_ls_samples(loader)
        assert out["latent_space_means"].shape == (32 * 4, 8)


class TestGatherResizeNormalize:
    def test_native_matches_numpy_fallback(self, rng):
        from runia_core_tpu.data import (
            HAVE_NATIVE,
            _resize_bilinear_numpy,
            gather_resize_normalize,
        )

        if not HAVE_NATIVE:
            pytest.skip("native extension not built")
        images = (rng.rand(6, 17, 23, 3) * 255).astype(np.uint8)
        idx = np.array([4, 0, 2], np.int64)
        native = gather_resize_normalize(images, idx, (8, 12))
        ref = _resize_bilinear_numpy(
            images[idx].astype(np.float32), 8, 12
        ) / 255.0
        np.testing.assert_allclose(native, ref, rtol=1e-5, atol=1e-5)

    def test_matches_jax_image_resize(self, rng):
        """Half-pixel semantics == jax.image.resize(method='bilinear') when
        upsampling or mildly downsampling (jax antialiases strong
        downsampling, which plain bilinear intentionally does not)."""
        import jax
        import jax.numpy as jnp

        from runia_core_tpu.data import gather_resize_normalize

        images = (rng.rand(2, 10, 14, 3) * 255).astype(np.uint8)
        idx = np.arange(2, dtype=np.int64)
        ours = gather_resize_normalize(images, idx, (20, 21), scale=1.0)
        jref = jax.image.resize(
            jnp.asarray(images.astype(np.float32)), (2, 20, 21, 3), "bilinear",
            antialias=False,
        )
        np.testing.assert_allclose(ours, np.asarray(jref), rtol=1e-4, atol=1e-3)

    def test_loader_resize_integration(self, rng):
        from runia_core_tpu.data import PrefetchLoader

        images = (rng.rand(10, 16, 16, 3) * 255).astype(np.uint8)
        loader = PrefetchLoader(
            images, batch_size=4, device_put=False, resize_to=(8, 8)
        )
        batches = [b for b, _ in loader]
        assert batches[0].shape == (4, 8, 8, 3)
        assert batches[-1].shape == (2, 8, 8, 3)  # ragged tail preserved

    def test_resize_excludes_bgr_flip(self, rng):
        from runia_core_tpu.data import PrefetchLoader

        with pytest.raises(AssertionError):
            PrefetchLoader(
                (rng.rand(4, 8, 8, 3) * 255).astype(np.uint8),
                resize_to=(4, 4), bgr_to_rgb=True,
            )

    def test_identity_resize_is_normalize(self, rng):
        from runia_core_tpu.data import gather_normalize, gather_resize_normalize

        images = (rng.rand(4, 9, 9, 3) * 255).astype(np.uint8)
        idx = np.arange(4, dtype=np.int64)
        same = gather_resize_normalize(images, idx, (9, 9))
        plain = gather_normalize(images, idx)
        np.testing.assert_allclose(same, plain, rtol=1e-6, atol=1e-6)
