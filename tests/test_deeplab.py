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
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        for os_, want in [(None, 2), (16, 4), (8, 8)]:
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
