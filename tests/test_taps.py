"""Feature-tap tests: capturing intermediates from arbitrary flax models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from runia_core_tpu.extraction import Hook, tap_flax_model


class PlainModel(nn.Module):
    """A model with no built-in taps — the 'user-supplied black box'."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(8, (3, 3), name="conv1")(x))
        x = nn.relu(nn.Conv(16, (3, 3), name="conv2")(x))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(4, name="head")(x)


@pytest.fixture(scope="module")
def plain():
    model = PlainModel()
    x = jnp.zeros((2, 8, 8, 3))
    variables = model.init(jax.random.key(0), x)
    return model, variables


class TestTapFlaxModel:
    def test_capture_by_substring(self, plain, rng):
        model, variables = plain
        fwd = tap_flax_model(model, variables, capture=("conv2",))
        x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
        out, taps = fwd(x)
        assert out.shape == (2, 4)
        assert taps["conv2"].shape == (2, 8, 8, 16)

    def test_alias(self, plain, rng):
        model, variables = plain
        fwd = tap_flax_model(
            model, variables, capture=("conv2",), tap_aliases={"pre_pool": "conv2"}
        )
        _, taps = fwd(jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32)))
        np.testing.assert_array_equal(
            np.asarray(taps["pre_pool"]), np.asarray(taps["conv2"])
        )

    def test_tap_matches_direct_computation(self, plain, rng):
        """Captured intermediate equals the activation computed by hand."""
        model, variables = plain
        fwd = tap_flax_model(model, variables, capture=("conv1",))
        x = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
        _, taps = fwd(x)
        params = variables["params"]["conv1"]
        # capture_intermediates records the submodule's own output — the Conv
        # result BEFORE the relu applied outside it.
        expected = (
            jax.lax.conv_general_dilated(
                x, params["kernel"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + params["bias"]
        )
        np.testing.assert_allclose(
            np.asarray(taps["conv1"]), np.asarray(expected), rtol=1e-5, atol=1e-6
        )

    def test_feeds_extractor(self, plain, rng):
        """Tapped arbitrary model drives the MC extractor end to end."""
        from runia_core_tpu.extraction import FastMCDSamplesExtractor

        model, variables = plain
        fwd = tap_flax_model(
            model, variables, capture=("conv2",), tap_aliases={"pre_pool": "conv2"}
        )
        extractor = FastMCDSamplesExtractor(
            model=fwd, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=4, dropblock_probs=0.3, dropblock_sizes=3,
        )
        loader = [(rng.rand(2, 8, 8, 3).astype(np.float32), np.zeros(2))]
        out = extractor.get_ls_samples(loader)
        assert out["latent_space_means"].shape == (8, 16)


class TestHookShim:
    def test_capture(self, plain, rng):
        model, variables = plain
        fwd = tap_flax_model(model, variables, capture=("conv1",))
        _, taps = fwd(jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32)))
        hook = Hook("conv1").capture(taps)
        assert hook.output.shape == (1, 8, 8, 8)
        hook.close()
        assert hook.output is None

    def test_backward_unsupported(self):
        with pytest.raises(AssertionError):
            Hook("x", backward=True)
