"""Coverage of reference test areas not hit elsewhere: stds/raw-preds
extraction variants, multi-layer taps, missing-kwarg asserts, subset_boxes
reproducibility (mirrors reference unit_test_image_level_extraction.py,
unit_test_postprocessors.py, unit_test_metrics.py structure)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import ASH, DDU, DICE, Mahalanobis, ReAct, ViM
from runia_core_tpu.evaluation.metrics import subset_boxes
from runia_core_tpu.extraction import FastMCDSamplesExtractor
from runia_core_tpu.models import SimpleConvNet, build_tapped_forward


@pytest.fixture(scope="module")
def forward():
    model = SimpleConvNet(num_classes=2, features=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    return build_tapped_forward(model, variables, taps=("pre_pool",))


class TestExtractionVariants:
    def test_return_stds(self, forward, rng):
        extractor = FastMCDSamplesExtractor(
            model=forward, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=4, dropblock_probs=0.4, dropblock_sizes=3,
            return_stds=True,
        )
        imgs = rng.rand(6, 16, 16, 3).astype(np.float32)
        out = extractor.get_ls_samples([(imgs, np.zeros(6))])
        assert out["latent_space_means"].shape == (24, 16)
        assert out["stds"].shape == (24, 16)
        assert np.isfinite(out["stds"]).all()

    def test_return_raw_predictions_and_gt_labels(self, forward, rng):
        extractor = FastMCDSamplesExtractor(
            model=forward, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=4, dropblock_probs=0.4, dropblock_sizes=3,
            return_raw_predictions=True, return_gt_labels=True,
        )
        imgs = rng.rand(6, 16, 16, 3).astype(np.float32)
        out = extractor.get_ls_samples([(imgs, np.arange(6))])
        assert out["raw_preds"].shape == (6, 2)
        assert out["gt_labels"].size == 6

    def test_multi_layer_taps(self, rng):
        model = SimpleConvNet(num_classes=2, features=8)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        fwd = build_tapped_forward(model, variables, taps=("pre_pool", "pre_pool"))
        extractor = FastMCDSamplesExtractor(
            model=fwd, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=4, dropblock_probs=[0.4, 0.2], dropblock_sizes=[3, 2],
            tap=["pre_pool", "pre_pool"],
        )
        imgs = rng.rand(4, 16, 16, 3).astype(np.float32)
        out = extractor.get_ls_samples([(imgs, np.zeros(4))])
        # two layers of 16 channels concatenated
        assert out["latent_space_means"].shape == (16, 32)

    def test_mean_reduction(self, forward, rng):
        extractor = FastMCDSamplesExtractor(
            model=forward, layer_type="Conv", reduction_method="mean",
            mcd_nro_samples=2, dropblock_probs=0.3, dropblock_sizes=3,
            channel_axis=1,
        )
        # channel-first input path requires NCHW taps; use a wrapped forward
        model = SimpleConvNet(num_classes=2, features=8)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        fwd_nchw = build_tapped_forward(
            model, variables, taps=("pre_pool",), channel_first_taps=True
        )
        extractor.model = fwd_nchw
        imgs = rng.rand(2, 16, 16, 3).astype(np.float32)
        out = extractor.get_ls_samples([(imgs, np.zeros(2))])
        # 'mean' keeps H: 16 channels x 4 rows (pre_pool is 4x4x16)
        assert out["latent_space_means"].shape == (4, 64)


class TestMissingKwargAsserts:
    """The reference asserts required kwargs per scorer
    (unit_test_postprocessors.py missing-kwarg cases)."""

    def test_ddu(self, rng):
        with pytest.raises(AssertionError, match="valid_feats"):
            DDU(num_classes=2).setup(rng.randn(10, 4), train_labels=np.zeros(10))
        with pytest.raises(AssertionError, match="train_labels"):
            DDU(num_classes=2).setup(rng.randn(10, 4), valid_feats=rng.randn(5, 4))

    def test_mahalanobis(self, rng):
        with pytest.raises(AssertionError, match="train_labels"):
            Mahalanobis(num_classes=2).setup(
                rng.randn(10, 4), valid_feats=rng.randn(5, 4)
            )

    def test_vim(self, rng):
        with pytest.raises(AssertionError, match="final_linear_layer_params"):
            ViM().setup(rng.randn(10, 4))

    def test_ash_react_dice(self, rng):
        fc = {"weight": rng.randn(2, 4), "bias": rng.randn(2)}
        for cls in (ASH, ReAct, DICE):
            with pytest.raises(AssertionError, match="valid_feats"):
                cls().setup(rng.randn(10, 4), final_linear_layer_params=fc)


class TestSubsetBoxes:
    def test_reproducible_and_limits(self, rng):
        n_train, n_valid, n_ood = 500, 300, 400
        ind = {
            "train latent_space_means": rng.randn(n_train, 8),
            "train logits": rng.randn(n_train, 4),
            "valid latent_space_means": rng.randn(n_valid, 8),
        }
        ood = {"x latent_space_means": rng.randn(n_ood, 8)}
        non_empty_id = {"valid": [i // 3 for i in range(n_valid)]}
        non_empty_ood = {"x": list(range(n_ood))}

        out = subset_boxes(
            {k: v.copy() for k, v in ind.items()},
            {k: v.copy() for k, v in ood.items()},
            ind_train_limit=100, ood_limit=150, random_seed=7, ood_names=["x"],
            non_empty_predictions_id={"valid": list(non_empty_id["valid"])},
            non_empty_predictions_ood={"x": list(non_empty_ood["x"])},
        )
        ind1, ood1, ne_id1, ne_ood1 = out
        assert ind1["train latent_space_means"].shape[0] == 100
        assert ind1["train logits"].shape[0] == 100
        assert ood1["x latent_space_means"].shape[0] == 150
        assert len(ne_ood1["x"]) == 150
        # same seed -> same subset
        out2 = subset_boxes(
            {k: v.copy() for k, v in ind.items()},
            {k: v.copy() for k, v in ood.items()},
            ind_train_limit=100, ood_limit=150, random_seed=7, ood_names=["x"],
            non_empty_predictions_id={"valid": list(non_empty_id["valid"])},
            non_empty_predictions_ood={"x": list(non_empty_ood["x"])},
        )
        np.testing.assert_array_equal(
            ind1["train latent_space_means"], out2[0]["train latent_space_means"]
        )


class TestExtractorEdgeFixes:
    def test_ragged_final_batch_gt_labels(self, rng):
        model = SimpleConvNet(num_classes=2, features=8)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        fwd = build_tapped_forward(model, variables, taps=("pre_pool",))
        ex = FastMCDSamplesExtractor(
            model=fwd, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=2, dropblock_probs=0.3, dropblock_sizes=3,
            return_gt_labels=True,
        )
        batches = [
            (rng.rand(6, 16, 16, 3).astype(np.float32), np.arange(6)),
            (rng.rand(4, 16, 16, 3).astype(np.float32), np.arange(4)),
        ]
        out = ex.get_ls_samples(batches)
        assert out["gt_labels"].shape == (10,)
        np.testing.assert_array_equal(out["gt_labels"], list(range(6)) + list(range(4)))

    def test_fc_return_stds_rejected(self):
        model = SimpleConvNet(num_classes=2, features=8)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        fwd = build_tapped_forward(model, variables, taps=("pre_pool",))
        with pytest.raises(ValueError, match="return_stds"):
            FastMCDSamplesExtractor(
                model=fwd, layer_type="FC", reduction_method="mean",
                mcd_nro_samples=2, dropblock_probs=0.3, dropblock_sizes=3,
                return_stds=True,
            )
