"""FSDP (ZeRO-3) train step on the 8-virtual-device CPU mesh.

Contract: parameter and Adam-moment leaves above the size threshold are
physically sharded over ``data``, and N steps of the sharded program equal
N steps of the single-device program (GSPMD's all-gather/reduce-scatter
schedule is a pure layout change).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from runia_core_tpu.models import SimpleConvNet
from runia_core_tpu.parallel import (
    fsdp_spec,
    fsdp_train_step,
    make_mesh,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, model_parallel=1, axis_names=("data", "model"))


class TestFsdpSpec:
    def test_small_leaves_replicated(self):
        assert fsdp_spec(jnp.zeros((64,)), 8) == P()

    def test_largest_divisible_dim_sharded(self):
        assert fsdp_spec(jnp.zeros((48, 1024)), 8, min_size=1) == P(None, "data")
        assert fsdp_spec(jnp.zeros((2048, 9)), 8, min_size=1) == P("data", None)

    def test_indivisible_replicated(self):
        assert fsdp_spec(jnp.zeros((9, 9)), 8, min_size=1) == P()


class TestFsdpTrainStep:
    def test_matches_single_device_and_shards_state(self, rng, mesh):
        model = SimpleConvNet(num_classes=4, features=32)
        images = rng.rand(16, 16, 16, 1).astype(np.float32)
        labels = rng.randint(0, 4, 16)
        variables = model.init(jax.random.key(0), jnp.asarray(images[:2]))
        params = variables["params"]

        # single-device reference: same step fn, replicated placement.
        # Independent buffers: shard_params aliases replicated leaves (a
        # same-sharding device_put is a no-op), and step() donates them.
        ref_step = fsdp_train_step(model, mesh, learning_rate=1e-2)
        ref_params = jax.tree_util.tree_map(lambda x: jnp.array(x), params)
        ref_opt = ref_step.init_opt(ref_params)

        step = fsdp_train_step(model, mesh, learning_rate=1e-2, min_size=256)
        sh_params = step.shard_params(params)
        sh_opt = step.init_opt(sh_params)

        # the big conv kernels and their Adam moments must actually shard
        big = sh_params["Conv_1"]["kernel"]  # (3, 3, 32, 64) -> 18k elems
        assert "data" in tuple(big.sharding.spec), big.sharding
        assert sh_opt.mu["Conv_1"]["kernel"].sharding == big.sharding

        imgs = shard_batch(jnp.asarray(images), mesh)
        lbls = shard_batch(jnp.asarray(labels), mesh)
        losses, ref_losses = [], []
        for _ in range(3):
            sh_params, sh_opt, loss = step(sh_params, sh_opt, imgs, lbls)
            ref_params, ref_opt, ref_loss = ref_step(
                ref_params, ref_opt, jnp.asarray(images), jnp.asarray(labels)
            )
            losses.append(float(loss))
            ref_losses.append(float(ref_loss))
        np.testing.assert_allclose(losses, ref_losses, rtol=1e-5, atol=1e-6)
        got = jax.tree_util.tree_map(np.asarray, sh_params)
        want = jax.tree_util.tree_map(np.asarray, ref_params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
            got, want,
        )

    def test_custom_loss_fn(self, rng, mesh):
        model = SimpleConvNet(num_classes=4, features=16)
        images = rng.rand(8, 16, 16, 1).astype(np.float32)
        variables = model.init(jax.random.key(2), jnp.asarray(images[:2]))

        def mse_on_logits(out, targets):
            logits, _taps = out
            return jnp.mean((logits - targets) ** 2)

        step = fsdp_train_step(model, mesh, loss_fn=mse_on_logits,
                               min_size=256)
        params = step.shard_params(variables["params"])
        opt = step.init_opt(params)
        targets = shard_batch(jnp.zeros((8, 4)), mesh)
        imgs = shard_batch(jnp.asarray(images), mesh)
        _, _, loss = step(params, opt, imgs, targets)
        assert np.isfinite(float(loss))

    def test_checkpoint_resume_preserves_sharding(self, rng, mesh, tmp_path):
        """Save sharded params+opt mid-training, restore with like= into the
        mesh layout, and the resumed run must match the uninterrupted one."""
        from runia_core_tpu.checkpoint import (
            load_state_dict_orbax,
            save_state_dict_orbax,
        )

        model = SimpleConvNet(num_classes=3, features=16)
        images = rng.rand(8, 16, 16, 1).astype(np.float32)
        labels = rng.randint(0, 3, 8)
        variables = model.init(jax.random.key(1), jnp.asarray(images[:2]))
        step = fsdp_train_step(model, mesh, min_size=256)
        params = step.shard_params(variables["params"])
        opt = step.init_opt(params)
        imgs = shard_batch(jnp.asarray(images), mesh)
        lbls = shard_batch(jnp.asarray(labels), mesh)

        params, opt, _ = step(params, opt, imgs, lbls)
        save_state_dict_orbax(tmp_path / "params", params)
        save_state_dict_orbax(tmp_path / "mu", opt.mu)

        # step() donates (params, opt), so build the resumed branch BEFORE
        # the continuation step invalidates those buffers — with fresh
        # (sharding-preserving) copies of the leaves the branches share.
        res_params = load_state_dict_orbax(tmp_path / "params", like=params)
        res_mu = load_state_dict_orbax(tmp_path / "mu", like=opt.mu)
        big = res_params["Conv_1"]["kernel"]
        assert "data" in tuple(big.sharding.spec), big.sharding
        fresh = lambda t: jax.tree_util.tree_map(lambda x: x + 0, t)
        resumed = opt._replace(step=fresh(opt.step), mu=res_mu,
                               nu=fresh(opt.nu))

        cont_params, cont_opt, _ = step(params, opt, imgs, lbls)
        res_params2, _, _ = step(res_params, resumed, imgs, lbls)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            res_params2, cont_params,
        )

    def test_causal_lm_task(self, rng, mesh):
        from runia_core_tpu.models import LlamaLM

        model = LlamaLM(vocab_size=64, num_layers=2, num_heads=4,
                        num_kv_heads=2, d_model=32, hidden_dim=64, max_len=32)
        tokens = rng.randint(1, 64, (16, 12)).astype(np.int32)
        variables = model.init(jax.random.key(0), jnp.asarray(tokens[:2]))
        params = variables["params"]

        step = fsdp_train_step(model, mesh, task="causal_lm", min_size=512)
        # shard_params aliases replicated leaves and step() donates them, so
        # the ref branch below needs its own copies.
        ref_params = jax.tree_util.tree_map(lambda x: jnp.array(x), params)
        sh_params = step.shard_params(params)
        sh_opt = step.init_opt(sh_params)
        toks = shard_batch(jnp.asarray(tokens), mesh)
        sh_params, sh_opt, loss = step(sh_params, sh_opt, toks, toks)

        ref_step = fsdp_train_step(model, mesh, task="causal_lm")
        _, _, ref_loss = ref_step(
            ref_params, ref_step.init_opt(ref_params),
            jnp.asarray(tokens), jnp.asarray(tokens),
        )
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=1e-5, atol=1e-6)
        emb = sh_params["embed"]["embedding"]
        assert "data" in tuple(emb.sharding.spec), emb.sharding
