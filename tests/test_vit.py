"""ViT model family: taps, and the full fused LaREx pipeline on a
transformer backbone (MC-DropBlock as structured token dropout on the
patch grid)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.inference import build_larex_scorer
from runia_core_tpu.models import ViT, build_tapped_forward
from runia_core_tpu.ops.entropy import marginal_entropy
from runia_core_tpu.sampling import mc_dropblock_samples

B, IMG, PATCH, D = 4, 16, 4, 32


@pytest.fixture(scope="module")
def vit_forward():
    model = ViT(num_classes=5, patch_size=PATCH, d_model=D, num_layers=2,
                num_heads=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    return build_tapped_forward(
        model, variables, taps=("encoder_tokens", "pre_head")
    )


class TestViT:
    def test_shapes_and_taps(self, vit_forward, rng):
        images = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
        logits, taps = vit_forward(images)
        assert logits.shape == (B, 5)
        assert taps["encoder_tokens"].shape == (B, IMG // PATCH, IMG // PATCH, D)
        assert taps["pre_head"].shape == (B, D)

    def test_patch_grid_requires_tiling(self):
        model = ViT(num_classes=2, patch_size=5)
        with pytest.raises(AssertionError):
            model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))

    def test_mc_dropblock_on_token_grid(self, vit_forward, rng):
        images = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
        _, taps = vit_forward(images)
        mc = mc_dropblock_samples(
            jax.random.key(1), taps["encoder_tokens"], 8, 2, 0.3,
            "Conv", channel_axis=3,
        )
        assert mc.shape == (B, 8, D)
        h = marginal_entropy(mc, 5)
        assert h.shape == (B, D) and np.isfinite(np.asarray(h)).all()

    def test_fused_larex_on_vit(self, vit_forward, rng):
        """The full fused scorer runs unchanged on the ViT tap and separates
        InD from far-OoD inputs."""
        fit_images = jnp.asarray(rng.rand(32, IMG, IMG, 3).astype(np.float32))
        _, taps = vit_forward(fit_images)
        mc = mc_dropblock_samples(
            jax.random.key(2), taps["encoder_tokens"], 8, 2, 0.3,
            "Conv", channel_axis=3,
        )
        h_train = np.asarray(marginal_entropy(mc, 5))
        md = MDLatentSpace()
        md.setup(h_train)
        scorer = build_larex_scorer(
            vit_forward, pca_state=None, detector_state=md.state,
            mcd_samples_nro=8, drop_block_prob=0.3, drop_block_size=2,
            tap="encoder_tokens", channel_axis=3,
        )
        ind = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
        ood = jnp.asarray(
            (rng.rand(B, IMG, IMG, 3) * 40 - 20).astype(np.float32)
        )
        _, s_ind = scorer(ind, jax.random.key(3))
        _, s_ood = scorer(ood, jax.random.key(3))
        assert np.isfinite(np.asarray(s_ind)).all()
        # Mahalanobis scores are negated distances: InD should score higher.
        assert float(np.median(np.asarray(s_ind))) > float(
            np.median(np.asarray(s_ood))
        )
