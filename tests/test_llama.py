"""LlamaLM architecture + HF weight-converter parity tests.

The converter must reproduce ``transformers.LlamaForCausalLM`` logits on the
same tokens (this is what makes real Llama-family checkpoints runnable on
the TPU-native generation path). A tiny random-init HF Llama keeps the test
hermetic (no downloads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.models import LlamaLM, convert_hf_llama
from runia_core_tpu.models.transformer import init_cache

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def tiny_hf_llama(tie=False, kv_heads=2):
    cfg = transformers.LlamaConfig(
        vocab_size=97,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=kv_heads,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def converted():
    hf = tiny_hf_llama()
    model, params = convert_hf_llama(hf)
    return hf, model, params


class TestHFParity:
    def test_logits_match_torch(self, converted):
        hf, model, params = converted
        rng = np.random.RandomState(0)
        tokens = rng.randint(0, 97, (3, 12))
        with torch.no_grad():
            want = hf(torch.tensor(tokens)).logits.numpy()
        got, attns, hiddens, _ = model.apply(params, jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)
        assert attns.shape == (2, 3, 4, 12, 12)
        assert hiddens.shape == (3, 3, 12, 32)

    def test_attentions_match_torch(self, converted):
        hf, model, params = converted
        rng = np.random.RandomState(1)
        tokens = rng.randint(0, 97, (2, 8))
        with torch.no_grad():
            out = hf(torch.tensor(tokens), output_attentions=True)
        want = np.stack([a.numpy() for a in out.attentions])  # (L, B, H, T, T)
        _, got, _, _ = model.apply(params, jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_tied_embeddings(self):
        hf = tiny_hf_llama(tie=True)
        model, params = convert_hf_llama(hf)
        assert model.tie_embeddings
        tokens = np.arange(10)[None, :] % 97
        with torch.no_grad():
            want = hf(torch.tensor(tokens)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)

    def test_mha_no_gqa(self):
        hf = tiny_hf_llama(kv_heads=4)
        model, params = convert_hf_llama(hf)
        tokens = np.arange(6)[None, :]
        with torch.no_grad():
            want = hf(torch.tensor(tokens)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)

    def test_rope_scaling_rejected(self):
        hf = tiny_hf_llama()
        hf.config.rope_scaling = {"rope_type": "linear", "factor": 2.0}
        with pytest.raises(NotImplementedError):
            convert_hf_llama(hf)


class TestDecodeCache:
    def test_prefill_plus_steps_equals_full_forward(self, converted):
        _, model, params = converted
        rng = np.random.RandomState(2)
        tokens = jnp.asarray(rng.randint(0, 97, (2, 10)))
        full_logits, *_ = model.apply(params, tokens)

        cache = init_cache(model, 2, 10)
        logits, _, _, cache = model.apply(
            params, tokens[:, :6], cache, jnp.int32(0)
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits[:, :6]), atol=1e-4
        )
        for i in range(6, 10):
            logits, _, _, cache = model.apply(
                params, tokens[:, i : i + 1], cache, jnp.int32(i)
            )
            np.testing.assert_allclose(
                np.asarray(logits[:, 0]), np.asarray(full_logits[:, i]),
                atol=1e-4,
            )

    def test_gqa_cache_shape(self, converted):
        _, model, _ = converted
        cache = init_cache(model, 2, 16)
        assert cache["layers"][0]["k"].shape == (2, 16, 2, 8)  # kv heads, head_dim


class TestGeneratorIntegration:
    def test_jax_generator_runs_llama(self, converted):
        from runia_core_tpu.llm.generate import JaxGenerator

        _, model, params = converted
        gen = JaxGenerator(model, params, max_new_tokens=5)
        out = gen.generate(prompt_tokens=[3, 1, 4, 1, 5], do_sample=False)
        assert len(out["sequences"][0]) == 10  # 5 prompt + 5 new
        assert np.isfinite(np.asarray(out["log_probs"])).all()

    def test_compute_uncertainties_on_llama(self, converted):
        from runia_core_tpu.llm import compute_uncertainties
        from runia_core_tpu.llm.generate import JaxGenerator

        _, model, params = converted
        gen = JaxGenerator(model, params, max_new_tokens=4)

        class IdTok:
            def encode(self, s):
                return [ord(c) % 97 for c in s]

            def decode(self, ids):
                return "".join(chr(65 + (i % 26)) for i in ids)

        text, res = compute_uncertainties(
            gen, IdTok(), "hello",
            [
                {"method_name": "perplexity"},
                {
                    "method_name": "RAUQ",
                    "token_aggregation": "mean_all_tokens",
                    "head_aggregation": "original",
                },
            ],
            num_samples=2,
        )
        assert isinstance(text[0], str)
        assert np.isfinite(res["perplexity"])
        rauq = res["RAUQ_mean_all_tokens_original"]
        vals = list(rauq.values()) if isinstance(rauq, dict) else [rauq]
        assert np.all(np.isfinite(np.asarray(vals, dtype=float)))


class TestTensorParallel:
    """Megatron-style TP shardings must not change the numbers."""

    def test_sharded_forward_matches_unsharded(self):
        from jax.sharding import Mesh
        from runia_core_tpu.parallel import llama_tp_specs, shard_llama_params

        model = LlamaLM(
            vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
            d_model=32, hidden_dim=64, max_len=32,
        )
        rng = np.random.RandomState(0)
        tokens = jnp.asarray(rng.randint(0, 64, (2, 9)))
        params = model.init(jax.random.key(0), tokens)
        want, *_ = model.apply(params, tokens)

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        specs = llama_tp_specs(params)
        # every q/k/v/gate/up/lm_head kernel column-sharded, o/down row-sharded
        p = specs["params"]["block_0"]
        assert p["q"]["kernel"] == jax.sharding.PartitionSpec(None, "model")
        assert p["o"]["kernel"] == jax.sharding.PartitionSpec("model", None)
        assert p["input_norm"]["scale"] == jax.sharding.PartitionSpec()

        sharded = shard_llama_params(params, mesh)
        got, *_ = jax.jit(lambda pr, t: model.apply(pr, t))(sharded, tokens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_attn_bias_model_shards_and_matches(self):
        """Qwen2-shaped params (q/k/v biases): biases follow their
        column-sharded output dim and the TP forward stays exact."""
        from jax.sharding import Mesh, PartitionSpec
        from runia_core_tpu.parallel import llama_tp_specs, shard_llama_params

        model = LlamaLM(
            vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
            d_model=32, hidden_dim=64, max_len=32, attn_bias=True,
        )
        rng = np.random.RandomState(3)
        tokens = jnp.asarray(rng.randint(0, 64, (2, 7)))
        params = model.init(jax.random.key(1), tokens)
        want, *_ = model.apply(params, tokens)

        specs = llama_tp_specs(params)
        assert specs["params"]["block_0"]["q"]["bias"] == PartitionSpec("model")

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        sharded = shard_llama_params(params, mesh)
        got, *_ = jax.jit(lambda pr, t: model.apply(pr, t))(sharded, tokens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_moe_expert_tensors_shard_and_match(self):
        """Mixtral-shaped params: expert stacks shard over the hidden dim
        (w_gate/w_up column-, w_down row-parallel), router replicated, and
        the TP forward stays exact."""
        from jax.sharding import Mesh, PartitionSpec
        from runia_core_tpu.parallel import llama_tp_specs, shard_llama_params

        model = LlamaLM(
            vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
            d_model=32, hidden_dim=64, max_len=32, num_experts=4,
        )
        rng = np.random.RandomState(5)
        tokens = jnp.asarray(rng.randint(0, 64, (2, 9)))
        params = model.init(jax.random.key(2), tokens)
        want, *_ = model.apply(params, tokens)

        specs = llama_tp_specs(params)
        blk = specs["params"]["block_0"]
        assert blk["w_gate"] == PartitionSpec(None, None, "model")
        assert blk["w_down"] == PartitionSpec(None, "model", None)
        assert blk["router"]["kernel"] == PartitionSpec()

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        sharded = shard_llama_params(params, mesh)
        got, *_ = jax.jit(lambda pr, t: model.apply(pr, t))(sharded, tokens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_quantized_moe_expert_tensors_shard_and_match(self):
        """int8 expert stacks shard like their f32 layout (scales follow
        the out dim of column-parallel stacks) and the TP forward equals
        the unsharded quantized forward."""
        from jax.sharding import Mesh, PartitionSpec
        from runia_core_tpu.models.llama import quantize_llama_params
        from runia_core_tpu.parallel import llama_tp_specs, shard_llama_params

        model = LlamaLM(
            vocab_size=64, num_layers=1, num_heads=4, num_kv_heads=2,
            d_model=32, hidden_dim=64, max_len=32, num_experts=4,
        )
        rng = np.random.RandomState(8)
        tokens = jnp.asarray(rng.randint(0, 64, (2, 7)))
        params = model.init(jax.random.key(6), tokens)
        qmodel = model.clone(quantized=True)
        qparams = quantize_llama_params(params)
        want, *_ = qmodel.apply(qparams, tokens)

        specs = llama_tp_specs(qparams)
        blk = specs["params"]["block_0"]
        assert blk["w_gate_q"] == PartitionSpec(None, None, "model")
        assert blk["w_gate_scale"] == PartitionSpec(None, "model")
        assert blk["w_down_q"] == PartitionSpec(None, "model", None)
        assert blk["w_down_scale"] == PartitionSpec()

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        sharded = shard_llama_params(qparams, mesh)
        got, *_ = jax.jit(lambda pr, t: qmodel.apply(pr, t))(sharded, tokens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_sharded_decode_via_generator(self):
        from jax.sharding import Mesh
        from runia_core_tpu.llm.generate import JaxGenerator
        from runia_core_tpu.parallel import shard_llama_params

        model = LlamaLM(
            vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
            d_model=32, hidden_dim=64, max_len=32,
        )
        tokens = jnp.asarray(np.arange(8)[None, :] % 64)
        params = model.init(jax.random.key(0), tokens)
        ref = JaxGenerator(model, params, max_new_tokens=4).generate(
            prompt_tokens=list(range(8)), do_sample=False
        )

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        sharded = shard_llama_params(params, mesh)
        got = JaxGenerator(model, sharded, max_new_tokens=4).generate(
            prompt_tokens=list(range(8)), do_sample=False
        )
        np.testing.assert_array_equal(ref["sequences"], got["sequences"])
        np.testing.assert_allclose(
            np.asarray(ref["log_probs"]), np.asarray(got["log_probs"]), atol=1e-5
        )


class TestBf16Serving:
    def test_bf16_close_to_f32_and_outputs_f32(self, converted):
        hf, _, _ = converted
        model16, params16 = convert_hf_llama(hf, dtype=jnp.bfloat16)
        model32, params32 = convert_hf_llama(hf)
        tokens = jnp.asarray(np.random.RandomState(5).randint(0, 97, (2, 10)))
        got16, attn16, hid16, _ = model16.apply(params16, tokens)
        got32, *_ = model32.apply(params32, tokens)
        assert got16.dtype == jnp.float32  # logits always f32
        assert attn16.dtype == jnp.float32
        assert hid16.dtype == jnp.float32
        # bf16 matmuls, f32 norms/softmax: small logit drift only
        assert np.abs(np.asarray(got16) - np.asarray(got32)).max() < 0.1

    def test_bf16_decode_cache(self, converted):
        hf, _, _ = converted
        model, params = convert_hf_llama(hf, dtype=jnp.bfloat16)
        cache = init_cache(model, 1, 8)
        assert cache["layers"][0]["k"].dtype == jnp.bfloat16
        tokens = jnp.asarray(np.arange(4)[None, :])
        logits, _, _, cache = model.apply(params, tokens, cache, jnp.int32(0))
        logits2, _, _, _ = model.apply(
            params, jnp.asarray([[7]]), cache, jnp.int32(4)
        )
        assert np.isfinite(np.asarray(logits)).all()
        assert np.isfinite(np.asarray(logits2)).all()


class TestFlashOption:
    def test_flash_model_falls_back_to_dense_off_tpu(self, converted):
        # On the CPU test backend _flash_available is False, so a
        # use_flash=True model must be bit-identical to the dense one.
        hf, _, _ = converted
        m_dense, params = convert_hf_llama(hf)
        m_flash, _ = convert_hf_llama(hf, use_flash=True)
        tokens = jnp.asarray(np.arange(12)[None, :] % 97)
        a, *_ = m_dense.apply(params, tokens)
        b, *_ = m_flash.apply(params, tokens)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_flash_block_sizes(self):
        from runia_core_tpu.models.llama import _flash_available, _flash_blocks

        assert not _flash_available(100)  # not 128-tileable
        bs = _flash_blocks(2048)
        assert bs.block_q == 512 and bs.block_k == 1024
        bs = _flash_blocks(384)
        assert bs.block_q == 128 and bs.block_k == 128

    def test_generator_with_flash_model_matches_dense_off_tpu(self, converted):
        # The generator passes assume_prefill to use_flash models; on the CPU
        # backend flash never engages, so outputs must be identical to the
        # dense model's (pins the kwarg plumbing and the fallback).
        from runia_core_tpu.llm.generate import JaxGenerator

        hf, _, _ = converted
        m_dense, params = convert_hf_llama(hf)
        m_flash, _ = convert_hf_llama(hf, use_flash=True)
        kw = dict(prompt_tokens=list(range(8)), do_sample=False,
                  output_attentions=False, output_hidden_states=False)
        a = JaxGenerator(m_dense, params, max_new_tokens=4).generate(**kw)
        b = JaxGenerator(m_flash, params, max_new_tokens=4).generate(**kw)
        np.testing.assert_array_equal(a["sequences"], b["sequences"])
        np.testing.assert_allclose(
            np.asarray(a["log_probs"]), np.asarray(b["log_probs"]), atol=1e-6
        )

    def test_context_window_warning(self, converted):
        from runia_core_tpu.llm.generate import JaxGenerator

        _, model, params = converted  # max_len=64
        gen = JaxGenerator(model, params, max_new_tokens=60)
        with pytest.warns(UserWarning, match="context window"):
            gen.generate(prompt_tokens=list(range(10)), do_sample=False,
                         output_attentions=False, output_hidden_states=False)


class TestInt8Quantization:
    def test_quantized_logits_close(self, converted):
        hf, _, _ = converted
        m32, p32 = convert_hf_llama(hf)
        mq, pq = convert_hf_llama(hf, quantize=True)
        assert mq.quantized
        tokens = jnp.asarray(np.random.RandomState(9).randint(0, 97, (2, 10)))
        want, *_ = m32.apply(p32, tokens)
        got, *_ = mq.apply(pq, tokens)
        # per-channel int8: small relative logit drift
        rel = np.abs(np.asarray(got) - np.asarray(want)).max() / (
            np.abs(np.asarray(want)).max()
        )
        assert rel < 0.05, rel

    def test_weight_bytes_halved_vs_bf16(self, converted):
        hf, _, _ = converted
        _, p32 = convert_hf_llama(hf)
        _, pq = convert_hf_llama(hf, quantize=True)
        def proj_bytes(tree, pred):
            return sum(
                np.asarray(l).nbytes
                for l in jax.tree_util.tree_leaves(tree)
                if pred(np.asarray(l))
            )
        q_bytes = proj_bytes(pq["params"]["block_0"], lambda a: a.dtype == np.int8)
        f_bytes = proj_bytes(
            p32["params"]["block_0"], lambda a: a.ndim == 2
        )
        assert q_bytes * 4 <= f_bytes + 1  # int8 vs f32 kernels

    def test_fused_qkv_bit_identical_to_unfused(self, converted):
        """fuse_quantized_llama_params concatenates stored kernels with no
        requantization: same int8 values, same scales — logits match the
        per-projection model to matmul reduction-order noise (the wider
        fused dot accumulates in a different order)."""
        from runia_core_tpu.models import fuse_quantized_llama_params

        hf, _, _ = converted
        mq, pq = convert_hf_llama(hf, quantize=True)
        mf = mq.copy(fused_qkv=True)
        pf = fuse_quantized_llama_params(pq)
        assert "qkv" in pf["params"]["block_0"]
        assert "q" not in pf["params"]["block_0"]
        tokens = jnp.asarray(np.random.RandomState(4).randint(0, 97, (2, 9)))
        want, *_ = mq.apply(pq, tokens)
        got, *_ = mf.apply(pf, tokens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-5)

    def test_quantized_decode_runs(self, converted):
        from runia_core_tpu.llm.generate import JaxGenerator

        hf, _, _ = converted
        mq, pq = convert_hf_llama(hf, quantize=True)
        out = JaxGenerator(mq, pq, max_new_tokens=4).generate(
            prompt_tokens=[1, 2, 3, 4], do_sample=False,
            output_attentions=False, output_hidden_states=False,
        )
        assert np.isfinite(np.asarray(out["log_probs"])).all()

    def test_tp_shards_quantized_params(self):
        from jax.sharding import Mesh, PartitionSpec as P
        from runia_core_tpu.models import quantize_llama_params
        from runia_core_tpu.parallel import llama_tp_specs, shard_llama_params

        model = LlamaLM(
            vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
            d_model=32, hidden_dim=64, max_len=32, quantized=True,
        )
        base = LlamaLM(
            vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
            d_model=32, hidden_dim=64, max_len=32,
        )
        fparams = base.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
        params = quantize_llama_params(
            jax.tree_util.tree_map(np.asarray, fparams)
        )
        specs = llama_tp_specs(params)
        blk = specs["params"]["block_0"]
        assert blk["q"]["kernel_q"] == P(None, "model")
        assert blk["q"]["scale"] == P("model")
        assert blk["o"]["kernel_q"] == P("model", None)
        assert blk["o"]["scale"] == P()

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        want, *_ = model.apply(params, jnp.asarray(np.arange(8)[None, :]))
        sharded = shard_llama_params(params, mesh)
        got, *_ = jax.jit(lambda p, t: model.apply(p, t))(
            sharded, jnp.asarray(np.arange(8)[None, :])
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )


class TestHiddenStatesParity:
    def test_last_hidden_is_post_norm_like_hf(self, converted):
        hf, model, params = converted
        tokens = np.random.RandomState(11).randint(0, 97, (2, 7))
        with torch.no_grad():
            out = hf(torch.tensor(tokens), output_hidden_states=True)
        want = np.stack([h.numpy() for h in out.hidden_states])  # (L+1, B, T, D)
        _, _, got, _ = model.apply(params, jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestKV8Cache:
    def test_cache_layout_int8(self, converted):
        hf, _, _ = converted
        model, _ = convert_hf_llama(hf, quantize_kv=True)
        cache = init_cache(model, 2, 16)
        layer = cache["layers"][0]
        assert layer["k"].dtype == jnp.int8
        assert layer["k_scale"].shape == (2, 16, 2)
        # int8 values + f32 scales: ~half the f32 cache bytes
        kv8 = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(layer))
        f32 = 2 * 2 * 16 * 2 * 8 * 4
        assert kv8 < 0.6 * f32

    def test_decode_drift_small(self, converted):
        hf, m32, p32 = converted
        mq, _ = convert_hf_llama(hf, quantize_kv=True)
        rng = np.random.RandomState(3)
        tokens = jnp.asarray(rng.randint(0, 97, (2, 12)))
        want, *_ = m32.apply(p32, tokens)

        cache = init_cache(mq, 2, 12)
        got, _, _, cache = mq.apply(p32, tokens[:, :8], cache, jnp.int32(0))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want[:, :8]), atol=0.05, rtol=0.05
        )
        for i in range(8, 12):
            got, _, _, cache = mq.apply(
                p32, tokens[:, i : i + 1], cache, jnp.int32(i)
            )
            rel = np.abs(np.asarray(got[:, 0]) - np.asarray(want[:, i])).max()
            assert rel < 0.1, (i, rel)

    def test_generator_runs_kv8(self, converted):
        from runia_core_tpu.llm.generate import JaxGenerator

        hf, _, _ = converted
        mq, pq = convert_hf_llama(hf, quantize_kv=True)
        out = JaxGenerator(mq, pq, max_new_tokens=4).generate(
            prompt_tokens=[1, 2, 3, 4, 5], do_sample=False,
            output_attentions=False, output_hidden_states=False,
        )
        assert np.isfinite(np.asarray(out["log_probs"])).all()


class TestLLMCheckpoint:
    def test_save_load_roundtrip(self, converted, tmp_path):
        from runia_core_tpu.checkpoint import load_llm, save_llm

        hf, model, params = converted
        path = tmp_path / "llm.npz"
        save_llm(path, model, params)
        m2, p2 = load_llm(path)
        assert type(m2).__name__ == "LlamaLM"
        assert m2.num_kv_heads == model.num_kv_heads
        tokens = jnp.asarray(np.arange(9)[None, :] % 97)
        a, *_ = model.apply(params, tokens)
        b, *_ = m2.apply(p2, tokens)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_quantized_roundtrip_keeps_int8(self, converted, tmp_path):
        from runia_core_tpu.checkpoint import load_llm, save_llm

        hf, _, _ = converted
        model, params = convert_hf_llama(hf, quantize=True, dtype=jnp.bfloat16)
        path = tmp_path / "llm_q.npz"
        save_llm(path, model, params)
        m2, p2 = load_llm(path)
        assert m2.quantized and m2.dtype == jnp.bfloat16
        blk = p2["params"]["block_0"]["q"]
        assert blk["kernel_q"].dtype == np.int8
        tokens = jnp.asarray(np.arange(6)[None, :])
        a, *_ = model.apply(params, tokens)
        b, *_ = m2.apply(p2, tokens)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestOnDeviceQuantization:
    def test_on_device_matches_host_path(self):
        """quantize_llama_params(on_device=True) runs as one jitted program
        (needed for multi-GB models over the TPU tunnel) and must produce
        bit-identical int8 kernels and scales to the numpy host path."""
        from runia_core_tpu.models import quantize_llama_params

        model = LlamaLM(
            vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
            d_model=32, hidden_dim=64, max_len=32,
        )
        fparams = model.init(jax.random.key(3), jnp.zeros((1, 4), jnp.int32))

        host = quantize_llama_params(jax.tree_util.tree_map(np.asarray, fparams))
        dev = quantize_llama_params(fparams, on_device=True)

        host_leaves, host_tree = jax.tree_util.tree_flatten(host)
        dev_leaves, dev_tree = jax.tree_util.tree_flatten(dev)
        assert host_tree == dev_tree
        for h, d in zip(host_leaves, dev_leaves):
            d = np.asarray(d)
            if h.dtype == np.int8:
                np.testing.assert_array_equal(h, d)
            else:
                np.testing.assert_allclose(h, np.asarray(d, h.dtype),
                                           rtol=1e-6, atol=1e-7)


class TestQwen2Family:
    """Qwen2/Qwen2.5 checkpoints: Llama layout + q/k/v projection biases."""

    @pytest.fixture(scope="class")
    def qwen(self):
        cfg = transformers.Qwen2Config(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        return transformers.Qwen2ForCausalLM(cfg).eval()

    def test_logits_match_torch(self, qwen):
        model, params = convert_hf_llama(qwen)
        assert model.attn_bias  # auto-detected from the checkpoint
        toks = np.random.RandomState(0).randint(1, 96, (2, 10))
        with torch.no_grad():
            want = qwen(torch.tensor(toks)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(toks))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

    def test_int8_keeps_biases(self, qwen):
        import dataclasses

        from runia_core_tpu.models import quantize_llama_params

        model, params = convert_hf_llama(qwen)
        qp = quantize_llama_params(params)
        assert "bias" in qp["params"]["block_0"]["q"]
        qmodel = dataclasses.replace(model, quantized=True)
        toks = np.random.RandomState(1).randint(1, 96, (1, 8))
        with torch.no_grad():
            want = qwen(torch.tensor(toks)).logits.numpy()
        got, *_ = qmodel.apply(qp, jnp.asarray(toks))
        rel = np.abs(np.asarray(got) - want).max() / np.abs(want).max()
        assert rel < 0.05, rel  # int8 weight rounding only

    def test_greedy_decode_matches_hf_generate(self, qwen):
        from runia_core_tpu.llm.generate import JaxGenerator

        model, params = convert_hf_llama(qwen)
        gen = JaxGenerator(model, params, max_new_tokens=6)
        prompt = [3, 17, 42, 9]
        ours = gen.generate(prompt, do_sample=False,
                            output_attentions=False,
                            output_hidden_states=False)["sequences"][0]
        with torch.no_grad():
            hf_out = qwen.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
            )[0].numpy()
        np.testing.assert_array_equal(np.asarray(ours), hf_out)

    def test_fully_windowed_qwen2_converts_with_parity(self):
        cfg = transformers.Qwen2Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            sliding_window=8, use_sliding_window=True,
            max_window_layers=0,
        )
        torch.manual_seed(4)
        hf = transformers.Qwen2ForCausalLM(cfg).eval()
        model, params = convert_hf_llama(hf)
        assert model.sliding_window == 8
        toks = np.random.RandomState(4).randint(1, 64, (2, 20))  # > window
        with torch.no_grad():
            want = hf(torch.tensor(toks)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(toks))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

    def test_mixed_window_layers_rejected(self):
        cfg = transformers.Qwen2Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            sliding_window=8, use_sliding_window=True,
            max_window_layers=1,
        )
        hf = transformers.Qwen2ForCausalLM(cfg).eval()
        with pytest.raises(NotImplementedError, match="mixed per-layer"):
            convert_hf_llama(hf)


class TestMistralFamily:
    """Mistral checkpoints with full attention (sliding_window=None) share
    the exact Llama layout; windowed ones must raise, not mis-attend."""

    def test_full_attention_mistral_converts(self):
        cfg = transformers.MistralConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            sliding_window=None, tie_word_embeddings=False,
        )
        torch.manual_seed(1)
        hf = transformers.MistralForCausalLM(cfg).eval()
        model, params = convert_hf_llama(hf)
        assert not model.attn_bias
        toks = np.random.RandomState(2).randint(1, 96, (2, 9))
        with torch.no_grad():
            want = hf(torch.tensor(toks)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(toks))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

    def test_windowed_mistral_parity_and_decode(self):
        """Mistral v0.1-style window: prefill logits AND the KV-cache decode
        trace must match HF beyond the window boundary."""
        from runia_core_tpu.llm.generate import JaxGenerator

        cfg = transformers.MistralConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            sliding_window=8,
        )
        torch.manual_seed(5)
        hf = transformers.MistralForCausalLM(cfg).eval()
        model, params = convert_hf_llama(hf)
        assert model.sliding_window == 8
        toks = np.random.RandomState(5).randint(1, 64, (1, 20))  # > window
        with torch.no_grad():
            want = hf(torch.tensor(toks)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(toks))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

        gen = JaxGenerator(model, params, max_new_tokens=8)
        prompt = toks[0, :12].tolist()
        ours = gen.generate(prompt, do_sample=False,
                            output_attentions=False,
                            output_hidden_states=False)["sequences"][0]
        with torch.no_grad():
            hf_out = hf.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            )[0].numpy()
        np.testing.assert_array_equal(np.asarray(ours), hf_out)


class TestMixtralFamily:
    """Mixtral: Mistral attention + sparse-MoE SwiGLU FFN (f32 router
    softmax over all experts, top-k renormalized, no token dropping) —
    modeling_mixtral.py::MixtralSparseMoeBlock."""

    @pytest.fixture(scope="class")
    def mixtral(self):
        cfg = transformers.MixtralConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            num_local_experts=4, num_experts_per_tok=2,
            sliding_window=None,
        )
        torch.manual_seed(0)
        return transformers.MixtralForCausalLM(cfg).eval()

    def test_logits_match_torch(self, mixtral):
        from runia_core_tpu.models import convert_hf_mixtral

        model, params = convert_hf_mixtral(mixtral)
        assert model.num_experts == 4 and model.num_experts_per_tok == 2
        assert params["params"]["block_0"]["w_gate"].shape == (4, 32, 64)
        assert params["params"]["block_0"]["w_down"].shape == (4, 64, 32)
        toks = np.random.RandomState(0).randint(1, 96, (2, 10))
        with torch.no_grad():
            want = mixtral(torch.tensor(toks)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(toks))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

    def test_greedy_decode_matches_hf_generate(self, mixtral):
        from runia_core_tpu.llm.generate import JaxGenerator
        from runia_core_tpu.models import convert_hf_mixtral

        model, params = convert_hf_mixtral(mixtral)
        gen = JaxGenerator(model, params, max_new_tokens=6)
        prompt = [5, 17, 42]
        ours = gen.generate(prompt, do_sample=False,
                            output_attentions=False,
                            output_hidden_states=False)["sequences"][0]
        with torch.no_grad():
            hf_out = mixtral.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
            )[0].numpy()
        np.testing.assert_array_equal(np.asarray(ours), hf_out)

    def test_int8_conversion_tracks_f32(self, mixtral):
        """quantize=True stores attention + expert stacks int8 (per-
        (expert, out-channel) scales); logits must track the f32 converter
        within per-channel int8 rounding error and greedy decode must stay
        on the same trace for this model."""
        from runia_core_tpu.llm.generate import JaxGenerator
        from runia_core_tpu.models import convert_hf_mixtral

        model_q, params_q = convert_hf_mixtral(mixtral, quantize=True)
        assert model_q.quantized
        blk = params_q["params"]["block_0"]
        assert blk["w_gate_q"].dtype == jnp.int8
        assert blk["w_gate_scale"].shape == (4, 64)
        assert blk["w_down_scale"].shape == (4, 32)
        assert "router" in blk and "kernel" in blk["router"]  # full precision

        model_f, params_f = convert_hf_mixtral(mixtral)
        toks = np.random.RandomState(2).randint(1, 96, (2, 10))
        got_q, *_ = model_q.apply(params_q, jnp.asarray(toks))
        got_f, *_ = model_f.apply(params_f, jnp.asarray(toks))
        corr = np.corrcoef(np.asarray(got_q).ravel(),
                           np.asarray(got_f).ravel())[0, 1]
        assert corr > 0.999, corr

        gen_q = JaxGenerator(model_q, params_q, max_new_tokens=5)
        gen_f = JaxGenerator(model_f, params_f, max_new_tokens=5)
        kw = dict(do_sample=False, output_attentions=False,
                  output_hidden_states=False)
        np.testing.assert_array_equal(
            gen_q.generate([5, 9, 2], **kw)["sequences"],
            gen_f.generate([5, 9, 2], **kw)["sequences"],
        )

    def test_routing_is_sparse(self, mixtral):
        """Exactly top-k experts get nonzero routing weight per token: zero
        the selected experts' contributions and the MoE output must vanish.
        (Guards the one-hot gate construction against dense leakage.)"""
        from runia_core_tpu.models import convert_hf_mixtral

        model, params = convert_hf_mixtral(mixtral)
        toks = np.random.RandomState(1).randint(1, 96, (1, 8))
        base, *_ = model.apply(params, jnp.asarray(toks))
        # Kill ALL experts' down projections -> MoE adds exactly zero, but
        # attention/residual still flow: logits change yet stay finite.
        import jax as _jax
        dead = _jax.tree_util.tree_map(lambda x: x, params)
        for i in range(2):
            dead["params"][f"block_{i}"]["w_down"] = np.zeros_like(
                dead["params"][f"block_{i}"]["w_down"]
            )
        out, *_ = model.apply(dead, jnp.asarray(toks))
        assert np.isfinite(np.asarray(out)).all()
        assert not np.allclose(np.asarray(out), np.asarray(base))


class TestGemmaFamily:
    """Gemma-1: Llama layout + sqrt(d) embedding scale, GeGLU, and a
    (1 + weight) RMSNorm (folded into the scales at conversion)."""

    @pytest.fixture(scope="class")
    def gemma(self):
        cfg = transformers.GemmaConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64,
        )
        torch.manual_seed(0)
        return transformers.GemmaForCausalLM(cfg).eval()

    def test_logits_match_torch(self, gemma):
        from runia_core_tpu.models import convert_hf_gemma

        model, params = convert_hf_gemma(gemma)
        assert model.embed_scale and model.mlp_act == "gelu_tanh"
        assert model.tie_embeddings and "lm_head" not in params["params"]
        toks = np.random.RandomState(0).randint(1, 96, (2, 10))
        with torch.no_grad():
            want = gemma(torch.tensor(toks)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(toks))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

    def test_greedy_decode_matches_hf_generate(self, gemma):
        from runia_core_tpu.llm.generate import JaxGenerator
        from runia_core_tpu.models import convert_hf_gemma

        model, params = convert_hf_gemma(gemma)
        gen = JaxGenerator(model, params, max_new_tokens=6)
        prompt = [7, 21, 33]
        ours = gen.generate(prompt, do_sample=False,
                            output_attentions=False,
                            output_hidden_states=False)["sequences"][0]
        with torch.no_grad():
            hf_out = gemma.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
            )[0].numpy()
        np.testing.assert_array_equal(np.asarray(ours), hf_out)

    def test_disagreeing_activation_fields_rejected(self, gemma):
        """The installed GemmaMLP runs ACT2FN[cfg.hidden_act]; a config whose
        legacy hidden_activation alias disagrees would convert an activation
        torch never runs, so the converter must refuse it."""
        from runia_core_tpu.models import convert_hf_gemma

        gemma.config.hidden_activation = "gelu"
        try:
            with pytest.raises(ValueError, match="hidden_act"):
                convert_hf_gemma(gemma)
        finally:
            gemma.config.hidden_activation = None

    def test_gemma2_softcapping_rejected(self):
        from runia_core_tpu.models import convert_hf_gemma

        cfg = transformers.Gemma2Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=64,
        )
        hf = transformers.Gemma2ForCausalLM(cfg).eval()
        with pytest.raises(NotImplementedError, match="soft-capping"):
            convert_hf_gemma(hf)
