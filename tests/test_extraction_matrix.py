"""Full extraction cross-product matrix.

Mirrors the reference's 1,846-line image-level extraction matrix
(reference tests/unit_test_image_level_extraction.py:37-1846): every
extractor class x {return_stds, raw_preds, gt_labels} x layer types x
reduction methods x single/multi dropblock layers, plus the
ImageLvlFeatureExtractor architecture matrix over all 7 supported detector
families and the invalid-configuration asserts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.extraction import (
    FastMCDSamplesExtractor,
    ImageLvlFeatureExtractor,
    MCDSamplesExtractor,
    deeplabv3p_get_ls_mcd_samples,
    get_latent_representation_mcd_samples,
)
from runia_core_tpu.extraction.adapters import DetectionResult
from runia_core_tpu.models import SimpleConvNet, build_tapped_forward

IMG = 16
S = 4  # MC samples
N = 6  # images per loader
C_PRE = 16  # pre_pool channels of SimpleConvNet(features=8)
HW = 4  # pre_pool spatial of 16px input


@pytest.fixture(scope="module")
def tapped():
    model = SimpleConvNet(num_classes=3, features=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    return build_tapped_forward(model, variables, taps=("pre_pool", "penultimate"))


@pytest.fixture(scope="module")
def stochastic(tapped):
    """Classic-extractor model: (images, key) -> (outputs, taps) with
    input-noise stochasticity standing in for active dropout."""

    def fwd(images, key):
        return tapped(images + jax.random.normal(key, images.shape) * 0.01)

    return fwd


def loader(rng, n=N, bs=3):
    xs = rng.rand(n, IMG, IMG, 3).astype(np.float32)
    ys = rng.randint(0, 3, n)
    return [(xs[i : i + bs], ys[i : i + bs]) for i in range(0, n, bs)]


class TestFastExtractorMatrix:
    """FastMCDSamplesExtractor x every return-option combination
    (reference unit_test_image_level_extraction.py:157-264,649-830)."""

    @pytest.mark.parametrize("return_stds", [False, True])
    @pytest.mark.parametrize("raw_preds", [False, True])
    @pytest.mark.parametrize("gt_labels", [False, True])
    def test_conv_fullmean_combinations(self, rng, tapped, return_stds,
                                        raw_preds, gt_labels):
        ex = FastMCDSamplesExtractor(
            model=tapped, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=S, dropblock_probs=0.4, dropblock_sizes=3,
            return_stds=return_stds, return_raw_predictions=raw_preds,
            return_gt_labels=gt_labels, rng=jax.random.key(1),
        )
        out = ex.get_ls_samples(loader(rng))
        assert out["latent_space_means"].shape == (N * S, C_PRE)
        assert ("stds" in out) == return_stds
        assert ("raw_preds" in out) == raw_preds
        assert ("gt_labels" in out) == gt_labels
        if return_stds:
            assert out["stds"].shape == (N * S, C_PRE)
            assert np.isfinite(out["stds"]).all()
        if raw_preds:
            assert out["raw_preds"].shape == (N, 3)  # one logits row per image
        if gt_labels:
            assert out["gt_labels"].shape == (N,)

    def test_conv_mean_reduction(self, rng, tapped):
        ex = FastMCDSamplesExtractor(
            model=tapped, layer_type="Conv", reduction_method="mean",
            mcd_nro_samples=S, dropblock_probs=0.4, dropblock_sizes=3,
        )
        out = ex.get_ls_samples(loader(rng))
        # mean over W only: rows keep H x C entries
        assert out["latent_space_means"].shape == (N * S, HW * C_PRE)

    def test_fc_layer_dropout(self, rng, tapped):
        ex = FastMCDSamplesExtractor(
            model=tapped, layer_type="FC", reduction_method="mean",
            tap="penultimate", mcd_nro_samples=S, dropblock_probs=0.3,
            dropblock_sizes=0,
        )
        out = ex.get_ls_samples(loader(rng))
        assert out["latent_space_means"].shape == (N * S, C_PRE)

    def test_multi_layer_dropblock_lists(self, rng, tapped):
        """Two tapped layers with per-layer dropblock configs concatenate
        features (reference image_level.py:220-236)."""
        ex = FastMCDSamplesExtractor(
            model=tapped, layer_type="Conv", reduction_method="fullmean",
            tap=["pre_pool", "pre_pool"], mcd_nro_samples=S,
            dropblock_probs=[0.3, 0.5], dropblock_sizes=[3, 2],
        )
        assert ex.dropout_n_layers == 2
        out = ex.get_ls_samples(loader(rng))
        assert out["latent_space_means"].shape == (N * S, 2 * C_PRE)

    def test_single_tap_broadcasts_over_prob_list(self, tapped):
        ex = FastMCDSamplesExtractor(
            model=tapped, layer_type="Conv", reduction_method="fullmean",
            dropblock_probs=[0.3, 0.5], dropblock_sizes=[3, 2],
        )
        assert ex.taps == ["pre_pool", "pre_pool"]

    def test_invalid_layer_type(self, tapped):
        with pytest.raises(AssertionError, match="'FC' or 'Conv'"):
            FastMCDSamplesExtractor(
                model=tapped, layer_type="Dense", reduction_method="fullmean"
            )

    def test_invalid_reduction(self, tapped):
        with pytest.raises(AssertionError, match="mean and fullmean"):
            FastMCDSamplesExtractor(
                model=tapped, layer_type="Conv", reduction_method="max"
            )

    def test_fc_return_stds_rejected(self, tapped):
        with pytest.raises(ValueError, match="Conv"):
            FastMCDSamplesExtractor(
                model=tapped, layer_type="FC", reduction_method="mean",
                return_stds=True,
            )

    def test_determinism_same_rng(self, rng, tapped):
        data = loader(rng)
        outs = []
        for _ in range(2):
            ex = FastMCDSamplesExtractor(
                model=tapped, layer_type="Conv", reduction_method="fullmean",
                mcd_nro_samples=S, dropblock_probs=0.4, dropblock_sizes=3,
                rng=jax.random.key(5),
            )
            outs.append(ex.get_ls_samples(data)["latent_space_means"])
        np.testing.assert_array_equal(outs[0], outs[1])


class TestClassicExtractorMatrix:
    """MCDSamplesExtractor (N stochastic forwards) x reductions
    (reference unit_test_image_level_extraction.py:270-470)."""

    def test_fullmean_shape(self, rng, stochastic):
        ex = MCDSamplesExtractor(
            model=stochastic, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=S,
        )
        out = ex.get_ls_samples(loader(rng))
        assert out.shape == (N * S, C_PRE)

    def test_mean_shape(self, rng, stochastic):
        ex = MCDSamplesExtractor(
            model=stochastic, layer_type="Conv", reduction_method="mean",
            mcd_nro_samples=S,
        )
        out = ex.get_ls_samples(loader(rng))
        assert out.shape == (N * S, HW * C_PRE)

    def test_mean_feature_ordering_matches_nchw(self, rng):
        """NHWC and NCHW 'mean' reductions must emit the SAME feature
        columns (C-major) for the same tensor — fitted detector state is
        layout-portable. Regression: the NHWC path once flattened H-major,
        silently permuting columns vs every other extractor path."""
        t = rng.rand(2, HW, HW, C_PRE).astype(np.float32)

        def fwd_nhwc(images, key):
            return None, {"pre_pool": jnp.asarray(t)}

        def fwd_nchw(images, key):
            return None, {"pre_pool": jnp.asarray(t.transpose(0, 3, 1, 2))}

        outs = []
        for fwd, axis in ((fwd_nhwc, 3), (fwd_nchw, 1)):
            ex = MCDSamplesExtractor(
                model=fwd, layer_type="Conv", reduction_method="mean",
                mcd_nro_samples=S, dropblock_probs=0.0, channel_axis=axis,
                rng=jax.random.key(0),
            )
            outs.append(np.asarray(ex.get_ls_samples(loader(rng, n=2, bs=2))))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("pool,expect_d", [((2, 2, 0), 2 * 2 * C_PRE),
                                               ((4, 4, 0), 1 * 1 * C_PRE)])
    def test_avgpool_shapes(self, rng, stochastic, pool, expect_d):
        ex = MCDSamplesExtractor(
            model=stochastic, layer_type="Conv", reduction_method="avgpool",
            avg_pooling_parameters=pool, mcd_nro_samples=S,
        )
        out = ex.get_ls_samples(loader(rng))
        assert out.shape == (N * S, expect_d)

    def test_fc_flattens(self, rng, stochastic):
        ex = MCDSamplesExtractor(
            model=stochastic, layer_type="FC", reduction_method="mean",
            tap="penultimate", mcd_nro_samples=S,
        )
        out = ex.get_ls_samples(loader(rng))
        assert out.shape == (N * S, C_PRE)

    def test_raw_predictions_per_sample(self, rng, stochastic):
        """Classic extractor returns one raw-prediction row per MC sample
        (N forwards really happen), unlike the fast extractor's per-image."""
        ex = MCDSamplesExtractor(
            model=stochastic, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=S, return_raw_predictions=True,
        )
        samples, raw = ex.get_ls_samples(loader(rng))
        assert samples.shape == (N * S, C_PRE)
        assert raw.shape == (N * S, 3)

    def test_single_image_batches(self, rng, stochastic):
        ex = MCDSamplesExtractor(
            model=stochastic, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=S,
        )
        out = ex.get_ls_samples(loader(rng, n=3, bs=1))
        assert out.shape == (3 * S, C_PRE)

    def test_consistency_same_rng(self, rng, stochastic):
        data = loader(rng)
        outs = []
        for _ in range(2):
            ex = MCDSamplesExtractor(
                model=stochastic, layer_type="Conv",
                reduction_method="fullmean", mcd_nro_samples=S,
                rng=jax.random.key(9),
            )
            outs.append(ex.get_ls_samples(data))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_sample_rows_differ(self, rng, stochastic):
        """The S rows of one image must be distinct realizations."""
        ex = MCDSamplesExtractor(
            model=stochastic, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=S,
        )
        out = ex.get_ls_samples(loader(rng))
        assert not np.allclose(out[0], out[1])

    def test_invalid_layer_type(self, stochastic):
        with pytest.raises(AssertionError, match="'FC' or 'Conv'"):
            MCDSamplesExtractor(
                model=stochastic, layer_type="conv", reduction_method="mean"
            )

    def test_invalid_reduction(self, stochastic):
        with pytest.raises(AssertionError, match="avg pool"):
            MCDSamplesExtractor(
                model=stochastic, layer_type="Conv", reduction_method="sum"
            )

    def test_avgpool_needs_three_params(self, stochastic):
        with pytest.raises(AssertionError, match="Three parameters"):
            MCDSamplesExtractor(
                model=stochastic, layer_type="Conv",
                reduction_method="avgpool", avg_pooling_parameters=(2, 2),
            )


class TestDeprecatedHelpers:
    """Reference-named deprecated entry points keep working
    (reference unit_test_image_level_extraction.py:487-607)."""

    def test_get_latent_representation_shape_and_warning(self, rng, stochastic):
        with pytest.warns(DeprecationWarning):
            out = get_latent_representation_mcd_samples(
                stochastic, loader(rng), S, "pre_pool", "Conv"
            )
        assert out.shape == (N * S, C_PRE)

    def test_get_latent_representation_consistency(self, rng, stochastic):
        data = loader(rng)
        with pytest.warns(DeprecationWarning):
            a = get_latent_representation_mcd_samples(
                stochastic, data, S, "pre_pool", "Conv", rng=jax.random.key(3)
            )
            b = get_latent_representation_mcd_samples(
                stochastic, data, S, "pre_pool", "Conv", rng=jax.random.key(3)
            )
        np.testing.assert_array_equal(a, b)

    def test_get_latent_representation_invalid_layer(self, stochastic):
        with pytest.raises(AssertionError, match="'FC' or 'Conv'"), \
             pytest.warns(DeprecationWarning):
            get_latent_representation_mcd_samples(
                stochastic, [], S, "pre_pool", "Attention"
            )

    def test_deeplabv3p_shape_and_warning(self, rng, stochastic):
        with pytest.warns(DeprecationWarning):
            out = deeplabv3p_get_ls_mcd_samples(stochastic, loader(rng), S)
        assert out.shape == (N * S, C_PRE)


# ---------------------------------------------------------------------------
# ImageLvlFeatureExtractor architecture matrix
# ---------------------------------------------------------------------------
def _fake_adapter(architecture):
    """Minimal adapted detector emitting the fmap structure each
    architecture's tap-postprocess expects (adapters.py:155-206)."""
    rng = np.random.RandomState(0)
    box = np.array([[2.0, 2.0, 10.0, 10.0]], np.float32)

    def fmaps():
        if architecture == "rcnn-backbone":
            return [{"p2": rng.rand(1, 8, 8, 8).astype(np.float32),
                     "p3": rng.rand(1, 8, 4, 4).astype(np.float32)}]
        if architecture == "rcnn-rpn":
            obj = [rng.rand(1, 3, 8, 8).astype(np.float32)]
            deltas = [rng.rand(1, 12, 8, 8).astype(np.float32)]
            return [(obj, deltas)]
        if architecture == "owlv2":
            return [rng.rand(1, 1 + 4 * 4, 24).astype(np.float32)]
        if architecture == "dino":
            return [(None, (None, None, rng.rand(1, 16, 6, 6).astype(np.float32)))]
        if architecture == "rtdetr-encoder":
            return [rng.rand(1, 400, 256).astype(np.float32)]
        # yolov8 / detr-backbone / rtdetr-backbone: plain (1, C, H, W)
        return [rng.rand(1, 32, 8, 8).astype(np.float32)]

    def model(image, predict_conf, **kw):
        return DetectionResult(
            boxes=box, img_shape=(IMG, IMG), scores=np.array([0.9], np.float32),
            classes=np.array([0]), logits=rng.rand(1, 3).astype(np.float32),
            fmaps=fmaps(),
        )

    return model


ARCH_CASES = [
    ("yolov8", None, 32),
    ("detr-backbone", None, 32),
    ("rtdetr-backbone", None, 32),
    ("rcnn", "backbone", 16),       # two pyramid levels x 8 channels
    ("rcnn", "rpn_head", 15),       # 3 objectness + 12 anchor-delta channels
    ("owlv2", None, 24),            # hidden size after CLS-drop reshape
    ("dino", None, 16),
    ("rtdetr-encoder", None, 256),
]


class TestImageLvlArchitectureMatrix:
    @pytest.mark.parametrize("arch,rcnn_type,expect_d", ARCH_CASES)
    def test_architecture_feature_shapes(self, rng, arch, rcnn_type, expect_d):
        fake_arch = (
            "rcnn-backbone" if (arch, rcnn_type) == ("rcnn", "backbone")
            else "rcnn-rpn" if (arch, rcnn_type) == ("rcnn", "rpn_head")
            else arch
        )
        ex = ImageLvlFeatureExtractor(
            model=_fake_adapter(fake_arch), architecture=arch,
            rcnn_extraction_type=rcnn_type,
        )
        data = [(f"im{i}", rng.rand(IMG, IMG, 3).astype(np.float32), i)
                for i in range(2)]
        out = ex.get_ls_samples(data, predict_conf=0.25)
        assert out["latent_space_means"].shape == (2, expect_d)
        assert out["logits"].shape == (2, 3)
        assert out["no_obj"] == []

    def test_invalid_architecture(self):
        with pytest.raises(AssertionError, match="supported"):
            ImageLvlFeatureExtractor(model=None, architecture="ssd")

    def test_return_stds_unimplemented(self):
        with pytest.raises(NotImplementedError):
            ImageLvlFeatureExtractor(
                model=None, architecture="yolov8", return_stds=True
            )

    def test_raw_predictions_carried(self, rng):
        ex = ImageLvlFeatureExtractor(
            model=_fake_adapter("yolov8"), architecture="yolov8",
            return_raw_predictions=True,
        )
        results, found = ex._get_samples_one_image(
            rng.rand(IMG, IMG, 3).astype(np.float32), predict_conf=0.25
        )
        assert found
        assert isinstance(results["raw_preds"], DetectionResult)
