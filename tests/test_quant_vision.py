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
    return jax.jit(model.init)(jax.random.key(0), jnp.zeros(shape, jnp.float32))


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
