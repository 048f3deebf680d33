"""Ring attention (sequence-parallel exact attention) vs dense reference.

The ring must be *exact*: identical to dense softmax attention over the full
sequence up to float32 rounding, for both causal and bidirectional masks, in
value AND gradient (the gradient exercises the transposed ppermute ring that
jax derives automatically)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.parallel import make_mesh, ring_attention, ring_self_attention

B, H, L, D = 2, 3, 64, 16


def dense_attention(q, k, v, causal):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    if causal:
        mask = jnp.tril(jnp.ones((q.shape[2], k.shape[2]), bool))
        s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.fixture(scope="module")
def qkv():
    r = np.random.RandomState(11)

    def mk():
        return jnp.asarray(r.randn(B, H, L, D).astype(np.float32))

    return mk(), mk(), mk()


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8, axis_names=("seq", "unused"))


class TestRingAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_dense(self, qkv, mesh8, causal):
        q, k, v = qkv
        ring = ring_attention(q, k, v, mesh8, seq_axis="seq", causal=causal)
        dense = dense_attention(q, k, v, causal)
        np.testing.assert_allclose(
            np.asarray(ring), np.asarray(dense), rtol=1e-5, atol=1e-5
        )

    def test_gradient_matches_dense(self, qkv, mesh8):
        q, k, v = qkv

        def loss_ring(q_, k_, v_):
            return jnp.sum(
                ring_attention(q_, k_, v_, mesh8, seq_axis="seq") ** 2
            )

        def loss_dense(q_, k_, v_):
            return jnp.sum(dense_attention(q_, k_, v_, True) ** 2)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for gr, gd in zip(g_ring, g_dense):
            np.testing.assert_allclose(
                np.asarray(gr), np.asarray(gd), rtol=1e-4, atol=1e-4
            )

    def test_uneven_not_required_but_two_devices(self, qkv, rng):
        # A smaller ring (2 devices) must give the same answer as 8.
        q, k, v = qkv
        mesh2 = make_mesh(2, axis_names=("seq", "unused"))
        r2 = ring_attention(q, k, v, mesh2, seq_axis="seq")
        dense = dense_attention(q, k, v, True)
        np.testing.assert_allclose(
            np.asarray(r2), np.asarray(dense), rtol=1e-5, atol=1e-5
        )

    def test_jit_under_mesh(self, qkv, mesh8):
        q, k, v = qkv
        f = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh8, "seq"))
        out = f(q, k, v)
        assert out.shape == (B, H, L, D) and np.isfinite(np.asarray(out)).all()


class TestRingSelfAttention:
    def test_full_layer(self, rng, mesh8):
        dm, heads = 24, 3
        x = jnp.asarray(rng.randn(2, L, dm).astype(np.float32))
        ws = [
            jnp.asarray(rng.randn(dm, dm).astype(np.float32) / np.sqrt(dm))
            for _ in range(4)
        ]
        out = ring_self_attention(x, *ws, mesh=mesh8, num_heads=heads, seq_axis="seq")
        # reference: dense layer math
        dh = dm // heads
        q, k, v = (
            (x @ w).reshape(2, L, heads, dh).transpose(0, 2, 1, 3) for w in ws[:3]
        )
        ref = dense_attention(q, k, v, True).transpose(0, 2, 1, 3).reshape(2, L, dm)
        ref = ref @ ws[3]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
