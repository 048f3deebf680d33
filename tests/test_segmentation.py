"""Segmentation model + LaREx-over-segmentation flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.evaluation import get_dl_h_z
from runia_core_tpu.extraction import (
    FastMCDSamplesExtractor,
    deeplabv3p_get_ls_mcd_samples,
)
from runia_core_tpu.models import SimpleSegmenter, build_tapped_forward


@pytest.fixture(scope="module")
def segmenter():
    model = SimpleSegmenter(num_classes=5, features=8)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    return model, variables


class TestSimpleSegmenter:
    def test_shapes(self, segmenter, rng):
        model, variables = segmenter
        x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        logits, taps = model.apply(variables, x)
        assert logits.shape == (2, 32, 32, 5)
        assert taps["pre_pool"].shape == (2, 8, 8, 32)

    def test_larex_over_segmentation(self, segmenter, rng):
        """MC-DropBlock on the bottleneck + LaREM, the deeplab use case."""
        model, variables = segmenter
        forward = build_tapped_forward(model, variables)
        extractor = FastMCDSamplesExtractor(
            model=forward, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=8, dropblock_probs=0.4, dropblock_sizes=3,
        )
        imgs = rng.rand(16, 32, 32, 3).astype(np.float32)
        out = extractor.get_ls_samples([(imgs, np.zeros(16))])
        assert out["latent_space_means"].shape == (16 * 8, 32)
        _, h_z = get_dl_h_z(out["latent_space_means"], 8)
        md = MDLatentSpace()
        md.setup(h_z)
        assert np.isfinite(md.postprocess(h_z)).all()

    def test_deprecated_deeplab_helper(self, segmenter, rng):
        model, variables = segmenter

        def stochastic_forward(images, key):
            logits, taps = model.apply(
                variables, images, rngs={"dropout": key}
            )
            # Inject stochasticity via the key for the MC loop: the helper
            # only needs per-call variation, provided here by input jitter.
            noise = jax.random.normal(key, images.shape) * 0.01
            logits2, taps2 = model.apply(variables, images + noise)
            return logits2, taps2

        imgs = rng.rand(4, 32, 32, 3).astype(np.float32)
        with pytest.warns(DeprecationWarning):
            samples = deeplabv3p_get_ls_mcd_samples(
                stochastic_forward, [(imgs, np.zeros(4))], 4,
            )
        assert samples.shape == (16, 32)
