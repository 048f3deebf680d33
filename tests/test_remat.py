"""Rematerialization options: identical forward values and gradients with
jax.checkpoint-wrapped blocks (memory is traded, numerics are not)."""

import numpy as np

import jax
import jax.numpy as jnp

from runia_core_tpu.models import ResNet, CausalLM
from runia_core_tpu.models.resnet import ResNetBlock


class TestRemat:
    def test_resnet_value_and_grad_match(self, rng):
        kwargs = dict(stage_sizes=(1, 1), block_cls=ResNetBlock,
                      num_classes=4, num_filters=8, cifar_stem=True)
        plain = ResNet(**kwargs)
        remat = ResNet(remat=True, **kwargs)
        images = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
        variables = plain.init(jax.random.key(0), images)

        def loss(model, v):
            logits, _ = model.apply(v, images, train=False)
            return jnp.sum(logits ** 2)

        l1, g1 = jax.value_and_grad(lambda v: loss(plain, v))(variables)
        l2, g2 = jax.value_and_grad(lambda v: loss(remat, v))(variables)
        assert float(l1) == float(l2)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_causallm_value_and_grad_match(self, rng):
        kwargs = dict(vocab_size=30, num_layers=2, num_heads=2, d_model=16,
                      max_len=16)
        plain = CausalLM(**kwargs)
        remat = CausalLM(remat=True, **kwargs)
        tokens = jnp.asarray(rng.randint(0, 30, (2, 8)), jnp.int32)
        variables = plain.init(jax.random.key(0), tokens)

        def loss(model, v):
            logits, _, _, _ = model.apply(v, tokens)
            return jnp.sum(jax.nn.log_softmax(logits) ** 2)

        l1, g1 = jax.value_and_grad(lambda v: loss(plain, v))(variables)
        l2, g2 = jax.value_and_grad(lambda v: loss(remat, v))(variables)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_remat_decode_path_unchanged(self, rng):
        """Cache-mode decode ignores remat (no activation memory to save)."""
        from runia_core_tpu.models.transformer import init_cache

        model = CausalLM(vocab_size=30, num_layers=2, num_heads=2,
                         d_model=16, max_len=16, remat=True)
        tokens = jnp.asarray(rng.randint(0, 30, (1, 4)), jnp.int32)
        params = model.init(jax.random.key(0), tokens)
        cache = init_cache(model, 1, 8)
        logits, _, _, cache = model.apply(params, tokens, cache, jnp.int32(0))
        assert logits.shape == (1, 4, 30)
