"""Space-to-depth stem: exact reparametrization of the 7x7/s2 stem conv.

The s2d stem is a pure performance transform (MXU-friendly 192-deep
contraction instead of a stride-2 conv over 3 channels), so the contract is
bit-parity with the plain stem up to float summation order — on fresh inits
via stem_to_s2d, and composed with torch_padding / converted weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.models import (
    ResNet18,
    ResNet50,
    space_to_depth_2x2,
    stem_to_s2d,
)


def _small(cls, **kw):
    return cls(num_classes=5, num_filters=16, **kw)


class TestSpaceToDepth:
    def test_layout_is_parity_major(self):
        # channels must be ordered (row parity, col parity, channel) —
        # the order stem_to_s2d's regrouped kernel contracts against.
        x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
        y = space_to_depth_2x2(x)
        assert y.shape == (2, 2, 2, 12)
        np.testing.assert_array_equal(
            np.asarray(y[0, 1, 0]),
            np.concatenate(
                [np.asarray(x[0, 2 + a, b]) for a in (0, 1) for b in (0, 1)]
            ),
        )


class TestS2dStemParity:
    @pytest.mark.parametrize("torch_padding", [False, True])
    def test_resnet18_logits_and_taps_match(self, torch_padding):
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        plain = _small(ResNet18, torch_padding=torch_padding)
        variables = plain.init(jax.random.key(0), images)
        s2d = _small(ResNet18, torch_padding=torch_padding, s2d_stem=True)
        logits_p, taps_p = plain.apply(variables, images)
        logits_s, taps_s = s2d.apply(stem_to_s2d(variables), images)
        np.testing.assert_allclose(
            np.asarray(logits_s), np.asarray(logits_p), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(taps_s["stem"]), np.asarray(taps_p["stem"]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(taps_s["pre_pool"]), np.asarray(taps_p["pre_pool"]),
            rtol=1e-5, atol=1e-5,
        )

    def test_resnet50_pre_pool_matches(self):
        rng = np.random.RandomState(1)
        images = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        plain = _small(ResNet50)
        variables = plain.init(jax.random.key(1), images)
        s2d = _small(ResNet50, s2d_stem=True)
        _, taps_p = plain.apply(variables, images)
        _, taps_s = s2d.apply(stem_to_s2d(variables), images)
        np.testing.assert_allclose(
            np.asarray(taps_s["pre_pool"]), np.asarray(taps_p["pre_pool"]),
            rtol=1e-4, atol=1e-5,
        )

    def test_fresh_init_param_shape(self):
        model = _small(ResNet18, s2d_stem=True)
        variables = model.init(
            jax.random.key(2), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        assert variables["params"]["conv_init"]["kernel"].shape == (4, 4, 12, 16)

    def test_quantize_resnet_rejects_s2d(self):
        from runia_core_tpu.models import quantize_resnet

        model = _small(ResNet18, s2d_stem=True)
        variables = model.init(
            jax.random.key(4), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        with pytest.raises(NotImplementedError, match="space-to-depth"):
            quantize_resnet(
                model, variables, np.zeros((2, 32, 32, 3), np.float32)
            )

    def test_stem_to_s2d_rejects_cifar_stem(self):
        model = _small(ResNet18, cifar_stem=True)
        variables = model.init(
            jax.random.key(3), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        with pytest.raises(AssertionError, match="7x7"):
            stem_to_s2d(variables)
