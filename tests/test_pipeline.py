"""Pipeline parallelism: GPipe schedule vs sequential block application.

The pipelined result must be numerically identical to running the S blocks
in sequence on the full batch, in value and gradient, for several
(stages, microbatches) shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.parallel import make_mesh
from runia_core_tpu.parallel.pipeline import pipeline_apply

B, DIM = 16, 8


def block_fn(params, x):
    w, b = params
    return x + jnp.tanh(x @ w + b)  # residual block, shape-preserving


def init_blocks(key, n_stages):
    keys = jax.random.split(key, n_stages)

    def one(k):
        kw, kb = jax.random.split(k)
        return (
            jax.random.normal(kw, (DIM, DIM)) * 0.3,
            jax.random.normal(kb, (DIM,)) * 0.1,
        )

    return jax.vmap(one)(keys)


def sequential(stacked, x):
    def body(x, params):
        return block_fn(params, x), None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.key(1), (B, DIM), jnp.float32)


class TestPipelineApply:
    @pytest.mark.parametrize("n_stages,n_micro", [(8, 4), (4, 8), (2, 2)])
    def test_matches_sequential(self, x, n_stages, n_micro):
        mesh = make_mesh(n_stages, model_parallel=n_stages,
                         axis_names=("data", "model"))
        stacked = init_blocks(jax.random.key(0), n_stages)
        ours = pipeline_apply(block_fn, stacked, x, mesh, n_micro)
        ref = sequential(stacked, x)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6
        )

    def test_gradient_matches_sequential(self, x):
        n_stages = 4
        mesh = make_mesh(n_stages, model_parallel=n_stages,
                         axis_names=("data", "model"))
        stacked = init_blocks(jax.random.key(0), n_stages)

        def loss_pipe(p):
            return jnp.sum(pipeline_apply(block_fn, p, x, mesh, 4) ** 2)

        def loss_seq(p):
            return jnp.sum(sequential(p, x) ** 2)

        gp = jax.grad(loss_pipe)(stacked)
        gs = jax.grad(loss_seq)(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gs)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_batch_must_divide(self, x):
        mesh = make_mesh(4, model_parallel=4, axis_names=("data", "model"))
        stacked = init_blocks(jax.random.key(0), 4)
        with pytest.raises(AssertionError):
            pipeline_apply(block_fn, stacked, x, mesh, 3)

    def test_jit(self, x):
        mesh = make_mesh(4, model_parallel=4, axis_names=("data", "model"))
        stacked = init_blocks(jax.random.key(0), 4)
        f = jax.jit(lambda p, xx: pipeline_apply(block_fn, p, xx, mesh, 4))
        out = f(stacked, x)
        assert out.shape == (B, DIM) and np.isfinite(np.asarray(out)).all()
