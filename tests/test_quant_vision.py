"""Int8 PTQ for the ResNet family (models/quant_vision.py).

Pins (1) the f32 calibration mirror against the flax forward — the
guarantee calibration sees the right tensors; (2) quantized-vs-float
fidelity of logits and taps; (3) that OoD separability survives
quantization end to end; (4) the precomputed-qparams path.

The reference has no quantized path (SURVEY.md section 2.2) — this is a
TPU-native capability addition; fidelity gates are vs our own f32 model.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from runia_core_tpu.models import (
    ResNet,
    ResNet50,
    build_tapped_forward,
    quantize_resnet,
    quantize_resnet_params,
)
from runia_core_tpu.models.resnet import ResNetBlock
from runia_core_tpu.models.quant_vision import _float_forward


def _init(model, shape):
    # Eager init on the CPU test path (CLAUDE.md init rule): per-op compiles
    # are cached across config variants, beating one jitted-init per variant.
    return model.init(jax.random.key(0), jnp.zeros(shape, jnp.float32))


def _images(rng, n, img):
    return rng.rand(n, img, img, 3).astype(np.float32)


@pytest.fixture(scope="module")
def r18():
    # Narrow 3-stage basic-block ResNet: exercises the identical structural
    # walk (stem + per-stage blocks + proj sites) at a fraction of the
    # ResNet-18 compile/run cost — the walk is size-agnostic by design.
    model = ResNet(
        stage_sizes=(1, 1, 1), block_cls=ResNetBlock, num_classes=10,
        num_filters=16, cifar_stem=True,
    )
    variables = _init(model, (2, 32, 32, 3))
    return model, variables


class TestFloatMirror:
    def test_matches_flax_forward_r18(self, r18):
        model, variables = r18
        rng = np.random.RandomState(0)
        x = _images(rng, 8, 32)
        logits_ref, taps_ref = build_tapped_forward(
            model, variables, taps=("stem", "block2", "pre_pool", "penultimate")
        )(x)
        logits, taps = _float_forward(model, variables)(x)
        np.testing.assert_allclose(logits, logits_ref, rtol=1e-4, atol=1e-4)
        for k in ("stem", "block2", "pre_pool", "penultimate"):
            np.testing.assert_allclose(
                taps[k], taps_ref[k], rtol=1e-4, atol=1e-4, err_msg=k
            )

    def test_matches_flax_forward_r50_imagenet_stem(self):
        # Bottleneck blocks + 7x7/stride-2 stem + max-pool branch.
        model = ResNet50(num_classes=7, num_filters=16)
        variables = _init(model, (2, 64, 64, 3))
        x = _images(np.random.RandomState(1), 4, 64)
        logits_ref, taps_ref = build_tapped_forward(
            model, variables, taps=("pre_pool",)
        )(x)
        logits, taps = _float_forward(model, variables)(x)
        np.testing.assert_allclose(logits, logits_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            taps["pre_pool"], taps_ref["pre_pool"], rtol=1e-4, atol=1e-4
        )


class TestQuantizedForward:
    def test_logits_and_taps_track_float(self, r18):
        model, variables = r18
        rng = np.random.RandomState(2)
        calib = _images(rng, 64, 32)
        qforward = quantize_resnet(
            model, variables, calib, taps=("pre_pool", "penultimate")
        )
        x = _images(rng, 32, 32)
        logits_q, taps_q = qforward(x)
        logits_f, taps_f = build_tapped_forward(
            model, variables, taps=("pre_pool", "penultimate")
        )(x)

        assert logits_q.dtype == jnp.float32
        # Per-image argmax agreement and tight relative error on the
        # penultimate features (what kNN/ViM/ASH/DICE consume).
        agree = np.mean(
            np.argmax(np.asarray(logits_q), -1) == np.argmax(np.asarray(logits_f), -1)
        )
        assert agree >= 0.9, agree
        rel = np.linalg.norm(taps_q["penultimate"] - taps_f["penultimate"]) / (
            np.linalg.norm(taps_f["penultimate"]) + 1e-12
        )
        assert rel < 0.15, rel
        corr = np.corrcoef(
            np.asarray(taps_q["pre_pool"]).ravel(),
            np.asarray(taps_f["pre_pool"]).ravel(),
        )[0, 1]
        assert corr > 0.99, corr

    def test_ood_separability_preserved(self, r18):
        # The gate that matters: int8 scoring must keep InD/OoD apart.
        model, variables = r18
        rng = np.random.RandomState(3)
        ind = _images(rng, 96, 32)
        ood = (rng.rand(96, 32, 32, 3) * 2.5 - 0.75).astype(np.float32)
        qforward = quantize_resnet(
            model, variables, ind[:64], taps=("penultimate",)
        )
        fforward = build_tapped_forward(model, variables, taps=("penultimate",))

        def auroc(forward):
            from runia_core_tpu.detectors import MDLatentSpace
            from runia_core_tpu.evaluation.metrics import jax_auroc

            feats_ind = np.asarray(forward(ind)[1]["penultimate"])
            feats_ood = np.asarray(forward(ood)[1]["penultimate"])
            md = MDLatentSpace()
            md.setup(feats_ind[:64])
            s_ind = np.asarray(md.postprocess(feats_ind[64:]))
            s_ood = np.asarray(md.postprocess(feats_ood))
            return float(jax_auroc(s_ind, s_ood))

        a_f, a_q = auroc(fforward), auroc(qforward)
        assert a_f > 0.9  # the float model separates this shift
        assert abs(a_f - a_q) < 0.05, (a_f, a_q)

    def test_precomputed_qparams_path(self, r18):
        model, variables = r18
        rng = np.random.RandomState(4)
        calib = _images(rng, 32, 32)
        qp = quantize_resnet_params(model, variables, calib)
        # Scales are per-output-channel, int8 kernels, f32 biases.
        stem = qp["conv_init"]
        assert stem["w_q"].dtype == np.int8
        assert stem["w_scale"].shape == (16,)
        assert np.all(np.abs(stem["w_q"]) <= 127)
        qforward = quantize_resnet(model, variables, None, qparams=qp)
        logits, taps = qforward(_images(rng, 4, 32))
        assert logits.shape == (4, 10)
        assert taps["pre_pool"].shape == (4, 8, 8, 64)

    def test_drop_in_for_object_scorer(self, r18):
        # The quantized forward keeps the tapped-forward contract, so the
        # batched object-level scorer composes with it unchanged.
        from runia_core_tpu.detectors import MDLatentSpace
        from runia_core_tpu.extraction.object_level_batched import (
            build_object_scorer,
            pad_detections,
        )

        model, variables = r18
        rng = np.random.RandomState(6)
        qforward = quantize_resnet(model, variables, _images(rng, 16, 32))
        fforward = build_tapped_forward(model, variables, taps=("pre_pool",))
        md = MDLatentSpace()
        md.setup(rng.randn(64, 64).astype(np.float32))

        images = _images(rng, 2, 32)
        dets = [
            {"boxes": np.array([[2.0, 2.0, 20.0, 24.0], [8.0, 4.0, 30.0, 30.0]],
                               np.float32)},
            {"boxes": np.zeros((0, 4), np.float32)},
        ]
        padded = pad_detections(dets, 4, (32, 32))
        s_q = np.asarray(
            build_object_scorer(qforward, md.state, (4,), (32, 32))(
                jnp.asarray(images), padded
            )
        )
        s_f = np.asarray(
            build_object_scorer(fforward, md.state, (4,), (32, 32))(
                jnp.asarray(images), padded
            )
        )
        assert s_q.shape == (2, 4)
        assert np.isfinite(s_q[0, :2]).all() and np.isfinite(s_q[1, 0])
        assert (s_q[0, 2:] == -np.inf).all()
        finite = np.isfinite(s_f)
        rel = np.abs(s_q[finite] - s_f[finite]) / (np.abs(s_f[finite]) + 1e-9)
        assert np.median(rel) < 0.2, rel

    def test_rejects_dilated_and_headless_backbones(self, r18):
        model, variables = r18
        dilated = ResNet(
            stage_sizes=(1, 1, 1), block_cls=ResNetBlock, num_classes=10,
            num_filters=16, cifar_stem=True, output_stride=8,
        )
        with pytest.raises(NotImplementedError, match="plain classification"):
            quantize_resnet_params(dilated, variables, _images(np.random.RandomState(0), 4, 32))

    def test_quantile_clips_outliers(self, r18):
        model, variables = r18
        rng = np.random.RandomState(5)
        calib = _images(rng, 32, 32)
        calib[0, 0, 0, 0] = 1e4  # one absurd pixel must not blow the scale
        qp_clip = quantize_resnet_params(model, variables, calib, act_quantile=99.9)
        qp_max = quantize_resnet_params(model, variables, calib, act_quantile=100.0)
        assert qp_clip["conv_init"]["x_scale"] < qp_max["conv_init"]["x_scale"] / 10


class TestTrainedAnchorPTQ:
    """VERDICT r2 item 5: int8 PTQ gated on TRAINED weights and real data —
    not just the random-weight + synthetic-shift worst case. Trains the
    smallest ResNet on the real scanned-digits anchor corpus (the
    test_real_data_anchor protocol), quantizes it, and requires the int8
    OoD AUROCs (vs real photo patches) to stay within a stated budget of
    the f32 path.

    Gates ride the scorers that actually separate on a trained BN backbone
    at this scale: penultimate-feature Mahalanobis (f32 AUROC ~0.995), MSP
    (~0.93), and energy (~0.90). The channel-mean-entropy LaREx pipeline is
    covered by the SimpleConvNet anchor (test_real_data_anchor, AUROC 0.95);
    on a BN'd ResNet this small its f32 AUROC sits near chance, so it
    cannot gate a quantization delta."""

    AUROC_BUDGET = 0.02
    ACC_BUDGET = 0.03

    @pytest.fixture(scope="class")
    def trained_resnet_digits(self):
        from test_real_data_anchor import _real_data
        from runia_core_tpu.training import fit_classifier

        (x_tr, y_tr), (x_te, y_te), x_ood = _real_data()
        model = ResNet(
            stage_sizes=(1, 1), block_cls=ResNetBlock, num_classes=10,
            num_filters=8, cifar_stem=True,
        )
        batches = [
            (x_tr[i : i + 64], y_tr[i : i + 64])
            for i in range(0, len(x_tr), 64)
        ]
        variables, _ = fit_classifier(
            model, batches, jax.random.key(7), jnp.asarray(x_tr[:2]),
            epochs=30, learning_rate=5e-3,
        )
        return model, variables, (x_tr, y_tr), (x_te, y_te), x_ood

    @staticmethod
    def _aurocs(forward, x_tr, x_te, y_te, x_ood):
        from sklearn.metrics import roc_auc_score

        from runia_core_tpu.detectors import MDLatentSpace

        logits_te, taps_te = forward(jnp.asarray(x_te))
        logits_ood, taps_ood = forward(jnp.asarray(x_ood))
        _, taps_tr = forward(jnp.asarray(x_tr))
        y = np.r_[np.ones(len(x_te)), np.zeros(len(x_ood))]

        out = {
            "acc": float((np.argmax(np.asarray(logits_te), -1) == y_te).mean())
        }
        msp = lambda lg: np.asarray(jax.nn.softmax(lg, -1).max(-1))
        out["msp"] = roc_auc_score(y, np.r_[msp(logits_te), msp(logits_ood)])
        energy = lambda lg: np.asarray(jax.scipy.special.logsumexp(lg, -1))
        out["energy"] = roc_auc_score(
            y, np.r_[energy(logits_te), energy(logits_ood)]
        )
        md = MDLatentSpace()
        md.setup(np.asarray(taps_tr["penultimate"]))
        out["md_penultimate"] = roc_auc_score(y, np.r_[
            np.asarray(md.postprocess(np.asarray(taps_te["penultimate"]))),
            np.asarray(md.postprocess(np.asarray(taps_ood["penultimate"]))),
        ])
        return out

    def test_int8_preserves_trained_anchor_aurocs(self, trained_resnet_digits):
        model, variables, (x_tr, _), (x_te, y_te), x_ood = trained_resnet_digits
        taps = ("penultimate",)
        f32_forward = build_tapped_forward(model, variables, taps=taps)
        q_forward = quantize_resnet(
            model, variables, calib_images=x_tr[:256], taps=taps
        )

        f = self._aurocs(f32_forward, x_tr, x_te, y_te, x_ood)
        q = self._aurocs(q_forward, x_tr, x_te, y_te, x_ood)

        # The trained f32 model must genuinely separate first.
        assert f["acc"] > 0.9, f
        assert f["md_penultimate"] > 0.95, f
        assert f["msp"] > 0.85, f

        assert q["acc"] > f["acc"] - self.ACC_BUDGET, (f, q)
        for name in ("msp", "energy", "md_penultimate"):
            assert q[name] > f[name] - self.AUROC_BUDGET, (
                f"int8 {name} AUROC degraded past the {self.AUROC_BUDGET} "
                f"budget: f32={f[name]:.4f} int8={q[name]:.4f}"
            )
        print("trained-anchor PTQ f32:", f, "int8:", q)
