"""Expert-parallel MoE FFN: sharded layer vs single-device reference.

With no capacity overflow the expert-sharded layer must match the unsharded
one exactly (routing is global, combine weights identical); drop behavior
and gradient flow are checked separately."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.parallel import make_mesh
from runia_core_tpu.parallel.moe import MoEParams, init_moe, moe_ffn, sharded_moe_ffn

T, D, H, E = 64, 16, 32, 8


@pytest.fixture(scope="module")
def params():
    return init_moe(jax.random.key(0), D, H, E)


@pytest.fixture(scope="module")
def tokens():
    return jax.random.normal(jax.random.key(1), (T, D), jnp.float32)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, model_parallel=4)  # data=2, model(expert)=4


class TestDenseReference:
    @pytest.mark.parametrize("top_k", [1, 2])
    def test_matches_manual_routing(self, params, tokens, top_k):
        """Layer output equals routing each token through its top-k experts
        by hand (ample capacity: nothing dropped)."""
        out = moe_ffn(params, tokens, capacity_factor=float(E), top_k=top_k)
        probs = jax.nn.softmax(tokens @ params.w_gate, axis=-1)
        top_p, top_idx = jax.lax.top_k(probs, top_k)
        top_p = top_p / top_p.sum(-1, keepdims=True)
        expected = np.zeros((T, D), np.float32)
        for t in range(T):
            for c in range(top_k):
                e_idx = int(top_idx[t, c])
                h = np.maximum(np.asarray(tokens[t] @ params.w_in[e_idx]), 0)
                expected[t] += float(top_p[t, c]) * np.asarray(
                    h @ params.w_out[e_idx]
                )
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)

    def test_capacity_drops_tokens(self, params, tokens):
        """Tiny capacity: overflowing tokens contribute exactly zero."""
        out = moe_ffn(params, tokens, capacity_factor=0.125, top_k=1)
        # capacity = max(1, 0.125*64/8) = 1: each expert serves 1 token
        zero_rows = np.where(np.abs(np.asarray(out)).max(axis=1) == 0)[0]
        assert len(zero_rows) >= T - E  # at most E tokens survive


class TestShardedMoE:
    @pytest.mark.parametrize("top_k", [1, 2])
    def test_matches_unsharded(self, params, tokens, mesh, top_k):
        ours = sharded_moe_ffn(
            params, tokens, mesh, capacity_factor=float(E), top_k=top_k
        )
        ref = moe_ffn(params, tokens, capacity_factor=float(E), top_k=top_k)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6
        )

    def test_gradients_flow_through_experts(self, params, tokens, mesh):
        def loss(p):
            return jnp.sum(
                sharded_moe_ffn(p, tokens, mesh, capacity_factor=float(E)) ** 2
            )

        grads = jax.grad(loss)(params)
        # every expert receives tokens at E=8, T=64, so all expert weights
        # get nonzero gradient
        g_in = np.asarray(grads.w_in)
        assert (np.abs(g_in).reshape(E, -1).max(axis=1) > 0).all()

    def test_sharded_grad_matches_unsharded(self, params, tokens, mesh):
        def loss_sharded(p):
            return jnp.sum(
                sharded_moe_ffn(p, tokens, mesh, capacity_factor=float(E)) ** 2
            )

        def loss_dense(p):
            return jnp.sum(moe_ffn(p, tokens, capacity_factor=float(E)) ** 2)

        gs = jax.grad(loss_sharded)(params)
        gd = jax.grad(loss_dense)(params)
        # atol covers near-zero gate-grad entries where reduction-order float
        # noise dominates any relative comparison
        for a, b in zip(gs, gd):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5
            )

    def test_jit(self, params, tokens, mesh):
        f = jax.jit(lambda p, x: sharded_moe_ffn(p, x, mesh))
        out = f(params, tokens)
        assert out.shape == (T, D) and np.isfinite(np.asarray(out)).all()


class TestMoECausalLM:
    """MoE-FFN transformer variant: cache-mode decode must reproduce the
    no-cache forward exactly (no-overflow capacity), and the generator
    stack must run unchanged on the MoE model."""

    @pytest.fixture(scope="class")
    def moe_lm(self):
        from runia_core_tpu.models.transformer import CausalLM

        model = CausalLM(
            vocab_size=32, num_layers=2, num_heads=2, d_model=16,
            max_len=32, num_experts=4, moe_capacity_factor=4.0,
        )
        params = model.init(jax.random.key(0), np.zeros((1, 4), np.int32))
        return model, params

    def test_has_expert_params(self, moe_lm):
        model, params = moe_lm
        block0 = params["params"]["block_0"]
        assert block0["moe_w_in"].shape == (4, 16, 64)
        assert block0["moe_w_out"].shape == (4, 64, 16)
        assert "mlp_out" not in block0

    def test_cache_matches_full_forward(self, moe_lm):
        from runia_core_tpu.models.transformer import init_cache

        model, params = moe_lm
        tokens = jnp.asarray([[3, 7, 1, 9, 2, 5]], jnp.int32)
        full_logits, _, _, _ = model.apply(params, tokens)

        cache = init_cache(model, 1, tokens.shape[1])
        logits0, _, _, cache = model.apply(
            params, tokens[:, :1], cache, jnp.int32(0)
        )
        step_logits = [logits0[:, 0]]
        for i in range(1, tokens.shape[1]):
            li, _, _, cache = model.apply(
                params, tokens[:, i:i + 1], cache, jnp.int32(i)
            )
            step_logits.append(li[:, 0])
        np.testing.assert_allclose(
            np.stack(step_logits, axis=1), np.asarray(full_logits),
            rtol=1e-4, atol=1e-5,
        )

    def test_generator_runs_on_moe_model(self, moe_lm):
        from runia_core_tpu.llm import JaxGenerator

        model, params = moe_lm
        gen = JaxGenerator(model, params, max_new_tokens=4)
        out = gen.generate([1, 2, 3], num_return_sequences=2, do_sample=True,
                           key=jax.random.key(1))
        assert out["sequences"].shape == (2, 7)
        assert np.isfinite(out["log_probs"]).all()
