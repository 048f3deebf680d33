"""DeepLabv3+ + dilated-ResNet backbone (models/deeplab.py, resnet.py).

Covers the output-stride mechanics (atrous stages keep resolution with an
unchanged param tree), the v3+ head/decoder shapes and taps, and the
reference segmentation workflow (`deeplabv3p_get_ls_mcd_samples`,
reference image_level.py:580-631) driving this model end to end into the
entropy stack.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from runia_core_tpu.models import DeepLabV3Plus, ResNet
from runia_core_tpu.models.resnet import ResNetBlock


def _init(model, shape, train=False):
    # Eager init: on the CPU test backend each tiny op-compile is cached
    # across configs, so this beats one big jitted-init compile per model
    # variant (the opposite holds on the tunneled TPU — see CLAUDE.md).
    return model.init(jax.random.key(0), jnp.zeros(shape, jnp.float32),
                      train=train)


SMALL = dict(
    backbone_stages=(1, 1, 1, 1),
    backbone_block=ResNetBlock,
    num_filters=8,
    aspp_features=16,
    low_level_features=8,
    aspp_rates=(2, 4),
)


class TestDilatedBackbone:
    def test_output_stride_keeps_resolution(self):
        kw = dict(
            stage_sizes=(1, 1, 1, 1), block_cls=ResNetBlock, num_classes=0,
            num_filters=8, include_head=False,
        )
        # 32 px distinguishes all three strides (block4 at 1/2/4 px) at a
        # quarter of the dilated-conv CPU cost of 64 px.
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        for os_, want in [(None, 1), (16, 2), (8, 4)]:
            model = ResNet(output_stride=os_, **kw)
            v = _init(model, x.shape)
            _, taps = model.apply(v, x)
            assert taps["block4"].shape[1] == want, (os_, taps["block4"].shape)

    def test_param_tree_identical_across_output_strides(self):
        # Dilation is pure config: a dilated backbone must load plain
        # checkpoints unchanged.
        kw = dict(
            stage_sizes=(1, 1, 1, 1), block_cls=ResNetBlock, num_classes=0,
            num_filters=8, include_head=False,
        )
        v_plain = _init(ResNet(output_stride=None, **kw), (1, 64, 64, 3))
        v_dil = _init(ResNet(output_stride=8, **kw), (1, 64, 64, 3))
        tp = jax.tree_util.tree_structure(v_plain)
        td = jax.tree_util.tree_structure(v_dil)
        assert tp == td
        for a, b in zip(jax.tree_util.tree_leaves(v_plain),
                        jax.tree_util.tree_leaves(v_dil)):
            assert a.shape == b.shape

    def test_include_head_false_drops_head_params(self):
        kw = dict(stage_sizes=(1, 1), block_cls=ResNetBlock, num_filters=8,
                  cifar_stem=True)
        v_head = _init(ResNet(num_classes=5, **kw), (1, 32, 32, 3))
        v_none = _init(ResNet(num_classes=0, include_head=False, **kw),
                       (1, 32, 32, 3))
        assert "head" in v_head["params"]
        assert "head" not in v_none["params"]
        model = ResNet(num_classes=0, include_head=False, **kw)
        logits, taps = model.apply(v_none, jnp.zeros((2, 32, 32, 3)))
        assert logits is None
        assert taps["penultimate"].shape == (2, 16)


class TestDeepLabV3Plus:
    @pytest.fixture(scope="class")
    def small(self):
        model = DeepLabV3Plus(num_classes=5, output_stride=16, **SMALL)
        variables = _init(model, (1, 64, 64, 3))
        return model, variables

    def test_shapes_and_taps(self, small):
        model, variables = small
        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
        logits, taps = model.apply(variables, x)
        assert logits.shape == (2, 64, 64, 5)
        assert taps["block4"].shape[1:3] == (4, 4)  # 1/16 of 64
        assert taps["aspp"].shape == (2, 4, 4, 16)
        assert taps["pre_pool"] is taps["aspp"]
        assert taps["decoder"].shape[1:3] == (16, 16)  # 1/4
        assert taps["penultimate"].shape == (2, 16)
        assert np.isfinite(np.asarray(logits)).all()

    def test_output_stride_8(self):
        model = DeepLabV3Plus(num_classes=3, output_stride=8, **SMALL)
        variables = _init(model, (1, 64, 64, 3))
        logits, taps = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
        assert taps["block4"].shape[1:3] == (8, 8)
        assert logits.shape == (1, 64, 64, 3)

    def test_three_stage_backbone(self):
        # ASPP reads the LAST stage tap whatever the stage count.
        model = DeepLabV3Plus(
            num_classes=3, output_stride=16, backbone_stages=(1, 1, 1),
            backbone_block=ResNetBlock, num_filters=8, aspp_features=16,
            low_level_features=8, aspp_rates=(2,),
        )
        variables = _init(model, (1, 64, 64, 3))
        logits, taps = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
        assert logits.shape == (1, 64, 64, 3)
        assert "block3" in taps and "block4" not in taps

    def test_single_stage_backbone_rejected(self):
        model = DeepLabV3Plus(backbone_stages=(1,), backbone_block=ResNetBlock)
        with pytest.raises(ValueError, match=">= 2 stages"):
            _init(model, (1, 64, 64, 3))

    def test_jittable_and_train_mode(self, small):
        model, variables = small
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        logits, _ = fwd(variables, jnp.zeros((1, 64, 64, 3)))
        assert logits.shape == (1, 64, 64, 5)
        # train=True exercises batch_stats mutation
        out, mutated = model.apply(
            variables, jnp.ones((2, 64, 64, 3)), train=True,
            mutable=["batch_stats"],
        )
        assert "batch_stats" in mutated

    def test_pixel_uncertainty_scorer(self, small):
        # Dense MC-dropout maps through one fused program; the dropout rng
        # drives the stochasticity (DeepLabV3Plus dropout_rate).
        from runia_core_tpu.inference import build_pixel_uncertainty_scorer

        model, variables = small
        mc_model = DeepLabV3Plus(
            num_classes=5, output_stride=16, dropout_rate=0.5, **SMALL
        )

        def stochastic(images, key):
            return mc_model.apply(variables, images, rngs={"dropout": key})

        scorer = build_pixel_uncertainty_scorer(stochastic, mc_samples=4)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
        out = scorer(x, jax.random.key(0))
        for k in ("pred_h", "mi", "msp"):
            assert out[k].shape == (2, 64, 64), k
            assert np.isfinite(np.asarray(out[k])).all(), k
        assert out["pred"].dtype == jnp.int32
        mi = np.asarray(out["mi"])
        assert (mi > -1e-5).all()  # MI nonnegative up to f32 noise
        assert mi.max() > 1e-4  # dropout actually injects disagreement
        # Deterministic model (no dropout) -> MI collapses to ~0.
        det = build_pixel_uncertainty_scorer(
            lambda images, key: model.apply(variables, images), mc_samples=4
        )
        mi_det = np.asarray(det(x, jax.random.key(1))["mi"])
        assert np.abs(mi_det).max() < 1e-5
        # pred_h matches the manual formula on the mean softmax.
        p = jax.nn.softmax(model.apply(variables, x)[0], axis=-1)
        manual = -np.sum(np.asarray(p) * np.log(np.asarray(p) + 1e-12), -1)
        np.testing.assert_allclose(
            np.asarray(det(x, jax.random.key(2))["pred_h"]), manual, atol=1e-4
        )

    def test_reference_segmentation_workflow(self, small):
        # deeplabv3p_get_ls_mcd_samples (reference image_level.py:580-631)
        # drives the model's dropout-tap through classic MC extraction; the
        # samples then feed get_dl_h_z exactly like the reference flow.
        from runia_core_tpu.extraction.image_level import (
            deeplabv3p_get_ls_mcd_samples,
        )
        from runia_core_tpu.evaluation.entropy import get_dl_h_z

        model, variables = small
        rng = np.random.RandomState(1)

        def stochastic_forward(images, rng_key=None):
            logits, taps = model.apply(variables, images)
            if rng_key is not None:  # MC noise stands in for dropout
                taps = dict(taps)
                taps["pre_pool"] = taps["pre_pool"] * jax.random.bernoulli(
                    rng_key, 0.8, taps["pre_pool"].shape
                ).astype(jnp.float32) / 0.8
            return logits, taps

        loader = [
            (rng.rand(1, 64, 64, 3).astype(np.float32), 0) for _ in range(3)
        ]
        with pytest.warns(DeprecationWarning):
            samples = deeplabv3p_get_ls_mcd_samples(
                stochastic_forward, loader, mcd_nro_samples=4,
                rng=jax.random.key(0),
            )
        samples = np.asarray(samples)
        assert samples.shape == (3 * 4, 16)  # (imgs*mc, aspp channels)
        _, h_z = get_dl_h_z(samples, 4)
        assert h_z.shape == (3, 16)
        assert np.isfinite(h_z).all()
