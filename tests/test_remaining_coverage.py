"""Coverage for remaining public paths: ImageLvlFeatureExtractor, the
classic MCD extractor's avgpool reduction, and the profiling utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.extraction import ImageLvlFeatureExtractor, MCDSamplesExtractor
from runia_core_tpu.models import JaxDetectorAdapter, SimpleDetector
from runia_core_tpu.utils import benchmark, record_time, trace_annotation

IMG = 64


@pytest.fixture(scope="module")
def det_adapter():
    model = SimpleDetector(num_classes=3, features=8, stride=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    return JaxDetectorAdapter(model, variables)


class TestImageLvlFeatureExtractor:
    def test_whole_image_features(self, det_adapter, rng):
        extractor = ImageLvlFeatureExtractor(
            model=det_adapter, architecture="yolov8", return_raw_predictions=False
        )
        loader = [(f"im{i}", rng.rand(IMG, IMG, 3).astype(np.float32), i)
                  for i in range(3)]
        out = extractor.get_ls_samples(loader, predict_conf=0.05)
        # One channel-mean feature row per image (neck fmap has 64 channels:
        # features=8 doubled through 3 downsample stages)
        assert out["latent_space_means"].shape == (3, 64)
        assert isinstance(out["no_obj"], list)

    def test_no_detection_tracked(self, det_adapter, rng):
        extractor = ImageLvlFeatureExtractor(model=det_adapter, architecture="yolov8")
        loader = [(f"im{i}", rng.rand(IMG, IMG, 3).astype(np.float32), i)
                  for i in range(3)]
        out = extractor.get_ls_samples(loader, predict_conf=0.999999)
        assert len(out["no_obj"]) == 3  # nothing passes the threshold

    def test_return_stds_unimplemented(self, det_adapter):
        with pytest.raises(NotImplementedError):
            ImageLvlFeatureExtractor(
                model=det_adapter, architecture="yolov8", return_stds=True
            )


class TestMCDAvgPool:
    def test_avgpool_reduction(self, rng):
        from runia_core_tpu.models import SimpleConvNet, build_tapped_forward

        model = SimpleConvNet(num_classes=2, features=4)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        fwd = build_tapped_forward(model, variables)

        def stochastic(images, key):
            return fwd(images + jax.random.normal(key, images.shape) * 0.01)

        extractor = MCDSamplesExtractor(
            model=stochastic, layer_type="Conv", reduction_method="avgpool",
            avg_pooling_parameters=(2, 2, 0), mcd_nro_samples=4,
        )
        imgs = rng.rand(2, 16, 16, 3).astype(np.float32)
        out = extractor.get_ls_samples([(imgs, np.zeros(2))])
        # pre_pool is (4, 4, 8); avgpool k2 s2 -> (2, 2, 8) -> 32 flat
        assert out.shape == (8, 32)

    def test_avgpool_requires_three_params(self):
        with pytest.raises(AssertionError):
            MCDSamplesExtractor(
                model=None, layer_type="Conv", reduction_method="avgpool",
                avg_pooling_parameters=(2, 2),
            )


class TestUtils:
    def test_record_time_blocks(self):
        @record_time
        def compute():
            return jnp.ones((256, 256)) @ jnp.ones((256, 256))

        result, seconds = compute()
        assert seconds > 0
        assert result.shape == (256, 256)

    def test_benchmark(self):
        f = jax.jit(lambda x: x * 2)
        out, dt = benchmark(f, jnp.ones(128), iters=3)
        assert dt > 0 and out.shape == (128,)

    def test_benchmark_warmup_zero_still_returns_result(self):
        """warmup=0 is clamped to 1: without the clamp the result stayed
        None and the first timed window absorbed compilation, reporting
        ~0 s/call."""
        f = jax.jit(lambda x: x + 1)
        out, dt = benchmark(f, jnp.ones(16), iters=2, warmup=0)
        assert out is not None and out.shape == (16,) and dt > 0

    def test_sync_skips_numpy_leaves(self):
        """sync must drain via a jax.Array leaf: device_get on a host numpy
        array is a no-op, so a numpy-first result tree used to skip the
        device-queue drain entirely (enqueue-time timings)."""
        import numpy as np

        from runia_core_tpu.utils.profiling import sync

        dev = jax.jit(lambda x: x * 2)(jnp.ones(8))
        # numpy leaf sorts first in the tree; the jax leaf must be chosen
        sync((np.ones(4), dev))
        # all-numpy and empty trees fall back without error
        sync(np.ones(4))
        sync(None)

    def test_trace_annotation_context(self):
        with trace_annotation("test-region"):
            _ = jnp.ones(8) + 1

    def test_enable_compilation_cache_persists_to_disk(self, tmp_path):
        from runia_core_tpu.utils import enable_compilation_cache

        path = enable_compilation_cache(str(tmp_path / "xla"),
                                        min_compile_time_secs=0.0)
        try:
            f = jax.jit(lambda x: (x @ x.T).sum())
            f(jnp.ones((128, 128))).block_until_ready()
            import os

            assert os.path.isdir(path) and len(os.listdir(path)) >= 1
        finally:
            jax.config.update("jax_compilation_cache_dir", None)

    def test_profile_taps_orders_and_times_stages(self):
        from runia_core_tpu.models import SimpleConvNet
        from runia_core_tpu.utils import profile_taps

        model = SimpleConvNet(num_classes=3, features=8)
        x = jnp.zeros((2, 16, 16, 3))
        variables = model.init(jax.random.key(0), x)
        out = profile_taps(model, variables, x, iters=2, warmup=1)
        assert set(out.keys()) == {"pre_pool", "penultimate"}
        assert all(dt > 0 for dt in out.values())
        sub = profile_taps(model, variables, x, taps=("penultimate",), iters=2)
        assert list(sub.keys()) == ["penultimate"]
