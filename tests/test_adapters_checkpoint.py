"""Tests for RCNN/YOLOv8 adapters, import helper, and checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import runia_core_tpu
from runia_core_tpu import module_exists
from runia_core_tpu.checkpoint import (
    load_detector,
    load_pca,
    save_detector,
    save_pca,
)
from runia_core_tpu.detectors import (
    DICE,
    Energy,
    GMMLatentSpace,
    KDELatentSpace,
    MDLatentSpace,
    ReAct,
)
from runia_core_tpu.rcnn import (
    MCSamplerRCNN,
    RCNNOutput,
    LaRDInferenceRCNN,
    LaRexInferenceRCNN,
    get_energy_score_rcnn,
    get_ls_mcd_samples_rcnn,
    get_msp_score_rcnn,
    remove_background_dimension,
)
from runia_core_tpu.reduction import pca_fit
from runia_core_tpu.yolov8 import FastMCDSamplesExtractorYolov8


class MockRCNN:
    """Adapted RCNN emulating the detectron2-style output protocol."""

    def __init__(self, rng, n_det=3, n_proposals=1000, n_classes=11):
        self.rng = rng
        self.n_det = n_det
        self.n_proposals = n_proposals
        self.n_classes = n_classes

    def __call__(self, image, key=None):
        n = self.n_det
        return RCNNOutput(
            scores=self.rng.rand(n).astype(np.float32) if n else np.zeros(0),
            inter_feat=self.rng.randn(max(n, 1), self.n_classes).astype(np.float32),
            box_cls=self.rng.randn(self.n_proposals, self.n_classes).astype(np.float32),
            latent=self.rng.rand(1, 8, 6, 6).astype(np.float32),
            rpn_feats=[self.rng.rand(1, 4, s, s).astype(np.float32) for s in (16, 8)],
            backbone_feats={
                f"p{i}": self.rng.rand(1, 4, s, s).astype(np.float32)
                for i, s in enumerate((16, 8))
            },
        )


class TestRCNNHelpers:
    def test_msp_score(self, rng):
        model = MockRCNN(rng)
        scores = get_msp_score_rcnn(model, [None, None, None])
        assert scores.shape == (3,)
        assert (scores > 0).all()

    def test_msp_no_detections(self, rng):
        model = MockRCNN(rng, n_det=0)
        scores = get_msp_score_rcnn(model, [None])
        assert scores[0] == 0.0

    def test_energy_score_strips_background(self, rng):
        model = MockRCNN(rng)
        raw, filt = get_energy_score_rcnn(model, [None, None])
        assert raw.shape == (2,) and filt.shape == (2,)
        assert np.isfinite(raw).all()

    def test_mc_sampler_rcnn(self, rng):
        feats = [rng.rand(1, 4, 16, 16).astype(np.float32),
                 rng.rand(1, 6, 8, 8).astype(np.float32)]
        sampler = MCSamplerRCNN(mc_samples=4)
        out = sampler(feats, jax.random.key(0))
        assert out.shape == (4, 10)
        assert not np.allclose(np.asarray(out)[0], np.asarray(out)[1])

    def test_get_ls_mcd_samples_rpn(self, rng):
        model = MockRCNN(rng)
        samples = get_ls_mcd_samples_rcnn(model, [None, None], 4, layer_type="RPN")
        assert samples.shape == (2 * 4, 8)  # 2 images x 4 samples, 4+4 channels

    def test_get_ls_mcd_samples_conv(self, rng):
        model = MockRCNN(rng)
        samples = get_ls_mcd_samples_rcnn(model, [None], 3, layer_type="Conv")
        assert samples.shape == (3, 8)

    def test_larex_inference_rcnn(self, rng):
        model = MockRCNN(rng)
        # Fit LaREM on entropies of sampled RPN features
        sampler = MCSamplerRCNN(mc_samples=8)
        from runia_core_tpu.evaluation import get_dl_h_z

        clouds = []
        for i in range(6):
            out = model(None)
            clouds.append(np.asarray(sampler(out.rpn_feats, jax.random.key(i))))
        stacked = np.concatenate(clouds, axis=0)
        _, h_z = get_dl_h_z(stacked, 8)
        larem = MDLatentSpace()
        larem.setup(h_z)

        inf = LaRexInferenceRCNN(
            model=model, postprocessor=larem, drop_block_prob=0.5,
            drop_block_size=3, mcd_samples_nro=8,
        )
        out, score = inf.get_score(None, key=jax.random.key(9))
        assert score.shape == (1,)
        (out2, score2), dt = inf.get_score_full_inference(None, key=jax.random.key(3))
        assert np.isfinite(score2).all() and dt > 0

    def test_lard_inference_rcnn_rpn(self, rng):
        model = MockRCNN(rng)
        feats = np.stack(
            [np.concatenate(
                [np.asarray(jnp.mean(jnp.asarray(f), axis=(2, 3))).ravel()
                 for f in model(None).rpn_feats]
            ) for _ in range(20)]
        )
        kde = KDELatentSpace()
        kde.setup(feats)
        inf = LaRDInferenceRCNN(model, kde, layer_type="RPN")
        out, score = inf.get_score(None)
        assert score.shape == (1,)

    def test_remove_background_dimension(self, rng):
        fc = {"weight": rng.randn(11, 8).astype(np.float32),
              "bias": rng.randn(11).astype(np.float32)}
        ind = {"train logits": rng.randn(5, 11), "valid logits": rng.randn(5, 11)}
        ood = {"x logits": rng.randn(5, 11)}
        ind, ood, fc = remove_background_dimension(fc, ind, ood, ["x"])
        assert fc["weight"].shape == (10, 8)
        assert ind["train logits"].shape == (5, 10)
        assert ood["x logits"].shape == (5, 10)


class TestYolov8Extractor:
    def test_bgr_flip_and_extraction(self, rng):
        from runia_core_tpu.models import SimpleConvNet, build_tapped_forward

        model = SimpleConvNet(num_classes=2, features=4)
        x_init = jnp.zeros((1, 16, 16, 3))
        variables = model.init(jax.random.key(0), x_init)
        forward = build_tapped_forward(model, variables)

        extractor = FastMCDSamplesExtractorYolov8(
            model=forward, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=4, dropblock_probs=0.3, dropblock_sizes=3,
        )
        # torch-style loader: (C, H, W) BGR batches
        loader = [(rng.rand(2, 3, 16, 16).astype(np.float32), np.zeros(2))
                  for _ in range(2)]
        out = extractor.get_ls_samples(loader)
        assert out["latent_space_means"].shape == (4 * 4, 8)
        assert extractor.return_variances is False  # reference bug fixed


class TestImportHelper:
    def test_existing(self):
        mod = module_exists("numpy")
        import numpy as np_mod

        assert mod is np_mod

    def test_missing_ignore(self):
        assert module_exists("nonexistent_module_xyz") is None

    def test_missing_raise(self):
        with pytest.raises(ImportError):
            module_exists("nonexistent_module_xyz", error="raise")

    def test_multiple(self):
        mods = module_exists("numpy", "json")
        assert len(mods) == 2


class TestCheckpoint:
    def test_md_roundtrip(self, rng, tmp_path):
        train = rng.randn(100, 16).astype(np.float32)
        test = rng.randn(20, 16).astype(np.float32)
        md = MDLatentSpace()
        md.setup(train)
        expected = md.postprocess(test)
        save_detector(tmp_path / "md.npz", md)
        loaded = load_detector(tmp_path / "md.npz")
        np.testing.assert_allclose(loaded.postprocess(test), expected, rtol=1e-6)

    def test_kde_roundtrip(self, rng, tmp_path):
        train = rng.randn(50, 8).astype(np.float32)
        test = rng.randn(10, 8).astype(np.float32)
        kde = KDELatentSpace()
        kde.setup(train)
        expected = kde.postprocess(test)
        save_detector(tmp_path / "kde.npz", kde)
        loaded = load_detector(tmp_path / "kde.npz")
        np.testing.assert_allclose(loaded.postprocess(test), expected, rtol=1e-6)

    def test_gmm_roundtrip(self, rng, tmp_path):
        train = rng.randn(120, 8).astype(np.float32)
        labels = rng.randint(0, 3, 120)
        test = rng.randn(10, 8).astype(np.float32)
        g = GMMLatentSpace(cfg=runia_core_tpu.config.Config(num_classes=3))
        g.setup(train, ind_train_labels=labels)
        expected = g.postprocess(test)
        save_detector(tmp_path / "gmm.npz", g, name="GMM")
        loaded = load_detector(
            tmp_path / "gmm.npz", cfg=runia_core_tpu.config.Config(num_classes=3)
        )
        np.testing.assert_allclose(loaded.postprocess(test), expected, rtol=1e-5)

    def test_energy_threshold_roundtrip(self, rng, tmp_path):
        logits = rng.randn(100, 5).astype(np.float32)
        e = Energy(flip_sign=False)
        e.setup(logits)
        save_detector(tmp_path / "e.npz", e)
        loaded = load_detector(tmp_path / "e.npz")
        assert loaded.threshold == pytest.approx(e.threshold)
        np.testing.assert_allclose(
            loaded.postprocess(logits), e.postprocess(logits), rtol=1e-6
        )

    def test_react_roundtrip(self, rng, tmp_path):
        train = np.abs(rng.randn(80, 12)).astype(np.float32)
        valid = np.abs(rng.randn(30, 12)).astype(np.float32)
        fc = {"weight": rng.randn(4, 12).astype(np.float32),
              "bias": rng.randn(4).astype(np.float32)}
        r = ReAct(flip_sign=False)
        r.setup(train, valid_feats=valid, final_linear_layer_params=fc)
        expected = r.postprocess(valid)
        save_detector(tmp_path / "r.npz", r)
        loaded = load_detector(tmp_path / "r.npz")
        np.testing.assert_allclose(loaded.postprocess(valid), expected, rtol=1e-6)

    def test_pca_roundtrip(self, rng, tmp_path):
        x = rng.randn(100, 16).astype(np.float32)
        new = rng.randn(10, 16).astype(np.float32)
        _, pca = pca_fit(x, 4)
        save_pca(tmp_path / "pca.npz", pca)
        loaded = load_pca(tmp_path / "pca.npz")
        np.testing.assert_allclose(
            loaded.transform(new), pca.transform(new), rtol=1e-5
        )


class TestTopLevelAPI:
    def test_reference_facing_names(self):
        # The reference's public sub-package names resolve
        assert runia_core_tpu.feature_extraction is runia_core_tpu.extraction
        assert runia_core_tpu.llm_uncertainty is runia_core_tpu.llm
        assert runia_core_tpu.dimensionality_reduction is runia_core_tpu.reduction
        # README-facing functions exist at top level
        assert callable(runia_core_tpu.apply_pca_ds_split)
        from runia_core_tpu.inference import LaRExInference  # noqa: F401
        from runia_core_tpu.detectors import LaREMPostprocessor  # noqa: F401

    def test_unknown_attr_raises(self):
        with pytest.raises(AttributeError):
            runia_core_tpu.not_a_real_attribute
