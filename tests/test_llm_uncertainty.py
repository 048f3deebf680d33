"""LLM uncertainty tests.

Strategy mirrors the reference's (tests/unit_test_llm_uncertainty.py):
synthetic HF-shaped attention tuples validate the aggregation and RAUQ math
against direct torch transcriptions of the reference formulas; a tiny
random-weight HF GPT-2 exercises the real generate flow offline; the
JaxGenerator end-to-end path runs the same scores on the TPU-native decode.
"""

import numpy as np
import pytest

import jax

from runia_core_tpu.llm import (
    JaxGenerator,
    StreamingAttentionAggregator,
    compute_uncertainties,
    eigen_score,
    generation_entropy,
    normalized_entropy,
    perplexity,
    rauq_uncertainty,
    rauq_uncertainty_mean_heads,
    rauq_uncertainty_rollout,
    semantic_entropy,
)
from runia_core_tpu.llm.attention import (
    _get_attention_rollout,
    _get_average_attention_all,
    _get_recurent_attention,
    _reconstruct_attention_matrix,
)

L, H, P, T = 3, 2, 4, 5  # layers, heads, prompt len, generated tokens


def make_hf_attentions(rng, layers=L, heads=H, p=P, t=T):
    """Synthetic HF-style attentions: tuple over steps of per-layer tuples."""
    def rows(shape):
        a = rng.rand(*shape).astype(np.float64)
        return a / a.sum(axis=-1, keepdims=True)

    attentions = [tuple(rows((1, heads, p, p)) for _ in range(layers))]
    for k in range(1, t):
        attentions.append(tuple(rows((1, heads, 1, p + k)) for _ in range(layers)))
    return tuple(attentions)


def torch_reference_rollout(attentions, input_length):
    """Direct transcription of the reference rollout for parity checking."""
    torch = pytest.importorskip("torch")
    num_generated = len(attentions)
    num_layers = len(attentions[0])
    bs, num_heads = attentions[0][0].shape[:2]
    n = input_length + num_generated
    full = torch.zeros((num_layers, bs, num_heads, n, n), dtype=torch.float64)
    for gi, per_layer in enumerate(attentions):
        for li, attn in enumerate(per_layer):
            attn = torch.from_numpy(np.asarray(attn))
            if gi == 0:
                full[li, :, :, :input_length, :input_length] = attn
            else:
                full[li, :, :, input_length + gi, : input_length + gi] = attn.squeeze(2)
    full = full.squeeze(1)
    identity = torch.eye(n, dtype=torch.float64)
    joint = None
    for l in range(num_layers):
        a = full[l].mean(dim=0) + identity
        a = a / a.sum(dim=-1, keepdim=True)
        joint = a if joint is None else a @ joint
    return joint.numpy()


class TestAttentionAggregation:
    def test_reconstruction_shape_and_rows(self, rng):
        attns = make_hf_attentions(rng)
        full = _reconstruct_attention_matrix(attns, P)
        assert full.shape == (L, H, P + T, P + T)
        # prompt block
        np.testing.assert_allclose(full[0, :, :P, :P], attns[0][0][0])
        # row P is empty (reference reconstruction quirk)
        np.testing.assert_array_equal(full[:, :, P, :], 0.0)
        # row P+1 holds step-1 attention
        np.testing.assert_allclose(full[1, :, P + 1, : P + 1], attns[1][1][0, :, 0, :])

    def test_rollout_matches_torch_reference(self, rng):
        attns = make_hf_attentions(rng)
        ours = _get_attention_rollout(attns, P)
        expected = torch_reference_rollout(attns, P)
        np.testing.assert_allclose(ours, expected, rtol=1e-10, atol=1e-12)

    def test_recurrent_attention(self, rng):
        attns = make_hf_attentions(rng)
        out = _get_recurent_attention(attns)
        assert out.shape == (L, H, T - 1)
        np.testing.assert_allclose(out[2, :, 0], attns[1][2][0, :, 0, -2])

    def test_average_attention(self, rng):
        attns = make_hf_attentions(rng)
        out = _get_average_attention_all(attns)
        assert out.shape == (L, H, T)
        np.testing.assert_allclose(out[0, :, 0], attns[0][0][0, :, 0, :].mean(axis=1))
        np.testing.assert_allclose(out[1, :, 2], attns[2][1][0, :, 0, :].mean(axis=1))


class TestStreamingAggregator:
    def test_matches_batch_functions(self, rng):
        attns = make_hf_attentions(rng)
        agg = StreamingAttentionAggregator(input_length=P)
        agg.prefill(attns[0])
        for step_attn in attns[1:]:
            agg.step(step_attn)

        np.testing.assert_allclose(
            agg.rollout, _get_attention_rollout(attns, P), rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(
            agg.prev_token_attention, _get_recurent_attention(attns), rtol=1e-12
        )
        np.testing.assert_allclose(
            agg.mean_past_attention, _get_average_attention_all(attns), rtol=1e-12
        )


class TestScores:
    def test_perplexity(self, rng):
        lp = -rng.rand(1, 6)
        assert perplexity(lp) == pytest.approx(float(-np.mean(lp)))

    def test_normalized_entropy_with_padding(self, rng):
        lp = -rng.rand(3, 6)
        lp[1, 4:] = -np.inf  # padded after EOS
        n = 3
        expected = 0.0
        for seq in lp:
            valid = seq != -np.inf
            expected += np.sum(seq[valid]) / np.sum(valid)
        expected = -expected / n
        assert normalized_entropy(lp) == pytest.approx(expected)

    def test_generation_entropy_uniform_is_one(self):
        vocab = 32
        logits = tuple(np.zeros((1, vocab)) for _ in range(4))
        assert generation_entropy(logits) == pytest.approx(1.0, abs=1e-6)

    def test_eigen_score_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        num_samples, hidden = 6, 12
        # hidden_states HF-shape: tuple over tokens of tuple over layers
        layers = tuple(rng.randn(num_samples, 1, hidden).astype(np.float32)
                       for _ in range(16))
        hidden_states = (layers,) * 3  # token index -1 picks the last
        ours = eigen_score(hidden_states)

        emb = torch.from_numpy(layers[15]).squeeze()
        cov = torch.cov(emb.T).numpy().astype(float)
        _, sv, _ = np.linalg.svd(cov + 1e-3 * np.eye(cov.shape[0]))
        assert ours == pytest.approx(float(np.mean(np.log(sv))), rel=1e-5)

    def test_eigen_gram_fast_path_matches_dense(self, rng):
        """n << d embeddings take the O(n^2 d) Gram path; its score must
        equal the reference SVD-of-covariance formula exactly (rank-
        deficient spectrum padded with log(alpha))."""
        from runia_core_tpu.llm.scores import eigen_score_from_embeddings

        for n, d in [(4, 256), (2, 64), (3, 33)]:
            x = rng.randn(n, d)
            cov = np.cov(x.T)
            _, sv, _ = np.linalg.svd(cov + 1e-3 * np.eye(d))
            dense = float(np.mean(np.log(sv)))
            assert eigen_score_from_embeddings(x) == pytest.approx(
                dense, abs=1e-9
            ), (n, d)

    def test_semantic_entropy_with_callable(self):
        # texts 0,1 equivalent; 2,3,4 distinct
        def equiv(a, b):
            return {frozenset([a, b])} <= {frozenset(["t0", "t1"])}

        entropy, clusters = semantic_entropy(equiv, None, ["t0", "t1", "t2", "t3"])
        assert clusters == {0: [0, 1], 1: [2], 2: [3]}
        probs = np.array([2 / 4, 1 / 4, 1 / 4])
        assert entropy == pytest.approx(float(-(probs * np.log(probs)).sum()))


class TestRAUQ:
    def torch_rauq_original(self, log_probs, attention_weights, alphas):
        torch = pytest.importorskip("torch")
        aw = torch.from_numpy(attention_weights)
        L_, _, N = aw.shape
        head_l = [int(torch.argmax(aw[l, :, 1:].mean(dim=1))) for l in range(L_)]
        probs = torch.from_numpy(log_probs).exp().squeeze()
        out = []
        for alpha in alphas:
            conf = torch.zeros((N, L_), dtype=torch.float64)
            conf[0, :] = probs[0]
            for i in range(1, N):
                att = torch.stack([aw[l, head_l[l], i] for l in range(L_)])
                conf[i, :] = alpha * probs[i] + (1 - alpha) * att * conf[i - 1, :]
            out.append(float((-torch.mean(torch.log(conf), dim=0)).max()))
        return out

    def test_original_matches_torch(self, rng):
        attns = make_hf_attentions(rng)
        log_probs = np.log(rng.rand(1, T) * 0.8 + 0.1)
        aw = _get_average_attention_all(attns)
        ours = rauq_uncertainty(log_probs, attns, "mean_all_tokens", alphas=[0.2, 0.5],
                                ablation=True)
        expected = self.torch_rauq_original(log_probs, aw, [0.2, 0.5])
        np.testing.assert_allclose(ours, expected, rtol=1e-8)

    def test_mean_heads(self, rng):
        attns = make_hf_attentions(rng)
        log_probs = np.log(rng.rand(1, T) * 0.8 + 0.1)
        score = rauq_uncertainty_mean_heads(log_probs, attns, "mean_all_tokens")
        assert np.isfinite(score)

    def test_rollout_matches_manual(self, rng):
        attns = make_hf_attentions(rng)
        log_probs = np.log(rng.rand(1, T) * 0.8 + 0.1)
        ours = rauq_uncertainty_rollout(
            log_probs, attns, "original", input_length=P, alphas=[0.4]
        )
        joint = _get_attention_rollout(attns, P)
        aw = np.diagonal(joint, offset=-1)[-T:]
        probs = np.exp(log_probs[0])
        conf = np.zeros(T)
        conf[0] = probs[0]
        for i in range(1, T):
            conf[i] = 0.4 * probs[i] + 0.6 * aw[i] * conf[i - 1]
        assert ours == pytest.approx(float(-np.mean(np.log(conf))), rel=1e-8)

    def test_rollout_streaming_input(self, rng):
        attns = make_hf_attentions(rng)
        log_probs = np.log(rng.rand(1, T) * 0.8 + 0.1)
        agg = StreamingAttentionAggregator(P)
        agg.prefill(attns[0])
        for a in attns[1:]:
            agg.step(a)
        batch = rauq_uncertainty_rollout(log_probs, attns, "original", P)
        streaming = rauq_uncertainty_rollout(
            log_probs, None, "original", P, attention_rollout=agg.rollout
        )
        assert streaming == pytest.approx(batch, rel=1e-10)


class IdentityTokenizer:
    def encode(self, tokens):
        return list(tokens)

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


class TestJaxGenerator:
    @pytest.fixture(scope="class")
    def generator(self):
        from runia_core_tpu.models.transformer import CausalLM

        model = CausalLM(vocab_size=50, num_layers=16, num_heads=2, d_model=32,
                         max_len=64)
        params = model.init(jax.random.key(0), np.zeros((1, 4), np.int32))
        return JaxGenerator(model, params, max_new_tokens=6)

    def test_structures(self, generator):
        out = generator.generate([1, 2, 3, 4], num_return_sequences=1)
        p, t = 4, 6
        assert out["sequences"].shape == (1, p + t)
        assert len(out["scores"]) == t
        assert len(out["attentions"]) == t
        assert out["attentions"][0][0].shape == (1, 2, p, p)
        assert out["attentions"][2][0].shape == (1, 2, 1, p + 2)
        assert len(out["hidden_states"][0]) == 17  # L+1 with embeddings first
        assert out["log_probs"].shape == (1, t)
        # attention rows are normalized over the visible prefix
        row = out["attentions"][3][5][0, :, 0, :]
        np.testing.assert_allclose(row.sum(axis=-1), 1.0, rtol=1e-4)

    def test_batched_multi_prompt_matches_single(self, generator):
        """Left-padded batched decode == per-prompt decode (greedy)."""
        prompts = [[1, 2, 3, 4], [7, 8], [5, 9, 2, 7]]
        batch = generator.generate_batch(prompts, do_sample=False)
        assert batch["sequences"].shape == (3, 4 + 6)
        for i, pr in enumerate(prompts):
            single = generator.generate(pr, do_sample=False)
            np.testing.assert_array_equal(
                single["sequences"][0, len(pr):], batch["sequences"][i, -6:]
            )
            np.testing.assert_allclose(
                single["log_probs"][0], batch["log_probs"][i], rtol=2e-4, atol=1e-5
            )

    def test_batched_rauq_matches_single(self, generator):
        """RAUQ from the batched decode's on-device prev-token attention taps
        == RAUQ from the single-prompt dense attention tuples."""
        from runia_core_tpu.llm import batched_rauq, rauq_uncertainty_mean_heads

        prompts = [[1, 2, 3, 4], [7, 8], [5, 9, 2, 7]]
        batch = generator.generate_batch(
            prompts, do_sample=False, output_attentions=True
        )
        # (B, L, H, T-1): layers, heads, decode steps minus the final forward
        assert batch["prev_token_attention"].shape == (3, 16, 2, 5)
        ours = batched_rauq(
            batch["log_probs"], batch["prev_token_attention"], "original"
        )
        ours_mh = batched_rauq(
            batch["log_probs"], batch["prev_token_attention"], "mean_heads",
            alphas=[0.3],
        )
        for i, pr in enumerate(prompts):
            single = generator.generate(pr, do_sample=False)
            ref = rauq_uncertainty(
                single["log_probs"], single["attentions"], "original"
            )
            assert ours[i] == pytest.approx(ref, rel=1e-3)
            ref_mh = rauq_uncertainty_mean_heads(
                single["log_probs"], single["attentions"], "original",
                alphas=[0.3],
            )
            assert ours_mh[i] == pytest.approx(ref_mh, rel=1e-3)

    def test_batched_rauq_rejects_rollout(self, generator):
        from runia_core_tpu.llm import batched_rauq

        with pytest.raises(KeyError):
            batched_rauq(np.zeros((1, 3)), np.zeros((1, 2, 2, 2)), "rollout")

    def test_sampling_differs(self, generator):
        out = generator.generate(
            [1, 2, 3, 4], num_return_sequences=4, do_sample=True,
            key=jax.random.key(5),
        )
        seqs = out["sequences"][:, 4:]
        assert len({tuple(s) for s in seqs.tolist()}) > 1

    def test_compute_uncertainties_end_to_end(self, generator):
        text, scores = compute_uncertainties(
            model=generator,
            tokenizer=IdentityTokenizer(),
            prompt=[1, 2, 3, 4],
            uncertainty_requests=[
                {"method_name": "perplexity"},
                {"method_name": "generation_entropy"},
                {"method_name": "normalized_entropy"},
                {"method_name": "eigen_score"},
                {
                    "method_name": "RAUQ",
                    "token_aggregation": "mean_all_tokens",
                    "head_aggregation": "rollout",
                    "alphas": [0.3],
                    "ablation": False,
                },
                {
                    "method_name": "semantic_entropy",
                },
            ],
            num_samples=3,
            entailment_model=lambda a, b: a == b,
            entailment_tokenizer=None,
        )
        for name in (
            "perplexity",
            "generation_entropy",
            "normalized_entropy",
            "eigen_score",
            "RAUQ_mean_all_tokens_rollout",
            "semantic_entropy",
        ):
            assert name in scores and np.isfinite(scores[name]), name
        assert "clusters" in scores


@pytest.mark.slow
class TestHFBackend:
    def test_tiny_gpt2(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        config = transformers.GPT2Config(
            vocab_size=100, n_positions=64, n_embd=32, n_layer=16, n_head=2,
        )
        # sdpa attention (the modern default) cannot emit attention maps and
        # silently returns None — force the eager implementation.
        model = transformers.AutoModelForCausalLM.from_config(
            config, attn_implementation="eager"
        ).eval()

        class TinyTok:
            def __call__(self, prompt, return_tensors="pt"):
                ids = torch.tensor([[int(t) for t in prompt.split()]])
                return transformers.BatchEncoding(
                    {"input_ids": ids, "attention_mask": torch.ones_like(ids)}
                )

            def batch_decode(self, seqs, skip_special_tokens=True):
                return [" ".join(str(int(i)) for i in s) for s in seqs]

        gen_config = transformers.GenerationConfig(
            max_new_tokens=5, pad_token_id=0, do_sample=False
        )
        text, scores = compute_uncertainties(
            model=model,
            tokenizer=TinyTok(),
            prompt="1 2 3",
            uncertainty_requests=[
                {"method_name": "perplexity"},
                {"method_name": "generation_entropy"},
                {"method_name": "normalized_entropy"},
                {"method_name": "eigen_score"},
                {
                    "method_name": "RAUQ",
                    "token_aggregation": "original",
                    "head_aggregation": "original",
                    "alphas": [0.2],
                    "ablation": False,
                },
            ],
            gen_config=gen_config,
            num_samples=3,
        )
        for name in (
            "perplexity",
            "generation_entropy",
            "normalized_entropy",
            "eigen_score",
            "RAUQ_original_original",
        ):
            assert name in scores and np.isfinite(scores[name]), name


class TestTapPruning:
    """Disabling attention/hidden taps leaves sequences/log_probs identical
    (same RNG stream) and returns empty tuples for the pruned keys."""

    def test_pruned_matches_full(self, generator_cls=None):
        from runia_core_tpu.models.transformer import CausalLM

        model = CausalLM(vocab_size=50, num_layers=2, num_heads=2, d_model=16,
                         max_len=32)
        params = model.init(jax.random.key(0), np.zeros((1, 4), np.int32))
        gen = JaxGenerator(model, params, max_new_tokens=5)
        key = jax.random.key(9)
        full = gen.generate([1, 2, 3], do_sample=True, key=key)
        pruned = gen.generate(
            [1, 2, 3], do_sample=True, key=key,
            output_attentions=False, output_hidden_states=False,
        )
        np.testing.assert_array_equal(full["sequences"], pruned["sequences"])
        np.testing.assert_allclose(
            full["log_probs"], pruned["log_probs"], rtol=1e-6
        )
        assert pruned["attentions"] == () and pruned["hidden_states"] == ()
        assert len(full["attentions"]) == 5

    def test_compute_uncertainties_without_taps(self):
        """Sequence-level scores work with both taps pruned (no RAUQ or
        eigen_score requested)."""
        from runia_core_tpu.models.transformer import CausalLM

        model = CausalLM(vocab_size=50, num_layers=2, num_heads=2, d_model=16,
                         max_len=32)
        params = model.init(jax.random.key(0), np.zeros((1, 4), np.int32))
        gen = JaxGenerator(model, params, max_new_tokens=5)
        _, scores = compute_uncertainties(
            gen, IdentityTokenizer(), [1, 2, 3],
            [{"method_name": "perplexity"},
             {"method_name": "normalized_entropy"}],
            num_samples=2,
        )
        assert np.isfinite(scores["perplexity"])
        assert np.isfinite(scores["normalized_entropy"])


class TestUniformBatchPath:
    """Uniform-length generate_batch drops the padding mask / custom
    positions (so flash prefill can engage); results must equal both the
    ragged code path and per-prompt decodes."""

    def test_uniform_matches_single_and_cfg_key(self):
        import jax
        from runia_core_tpu.llm import JaxGenerator
        from runia_core_tpu.models import LlamaLM

        model = LlamaLM(vocab_size=64, num_layers=2, num_heads=4,
                        num_kv_heads=2, d_model=32, hidden_dim=64, max_len=64)
        import jax.numpy as jnp

        params = model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
        gen = JaxGenerator(model, params, max_new_tokens=5)
        prompts = [[1, 2, 3, 4], [9, 8, 7, 6], [5, 5, 5, 5]]
        batch = gen.generate_batch(prompts, do_sample=False)
        key = next(k for k in gen._decode_cache if k[0] == "batch")
        # cfg = ("batch", b, p, max_new, do_sample, temperature,
        #        output_attentions, output_scores, uniform, top_k, top_p)
        assert key[8] is True  # uniform path taken
        for i, pr in enumerate(prompts):
            single = gen.generate(
                pr, do_sample=False,
                output_attentions=False, output_hidden_states=False,
            )
            np.testing.assert_array_equal(
                np.asarray(single["sequences"][0, len(pr):]),
                batch["sequences"][i, -5:],
            )


class TestBatchedSemanticClustering:
    """The batched path must yield byte-identical clusters to the sequential
    oracle while issuing O(1) model calls."""

    @staticmethod
    def _label_table(rng, texts):
        """Deterministic random NLI labels for every ordered text pair."""
        table = {}
        for a in texts:
            for b in texts:
                table[(a, b)] = int(rng.integers(0, 3))
        return table

    def test_matches_sequential_oracle(self):
        from runia_core_tpu.llm.utils import (
            _labels_equivalent,
            _semantic_clustering,
            _semantic_clustering_batched,
        )

        for seed in range(20):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(1, 12))
            texts = [f"text-{i}" for i in range(n)]
            table = self._label_table(rng, texts)

            def pair_equiv(a, b):
                return _labels_equivalent(table[(a, b)], table[(b, a)])

            calls = []

            def batch_labels(premises, hypotheses):
                calls.append(len(premises))
                return np.array([table[(p, h)] for p, h in zip(premises, hypotheses)])

            seq = _semantic_clustering(pair_equiv, None, texts)
            bat = _semantic_clustering_batched(batch_labels, None, texts)
            assert seq == bat, (seed, seq, bat)
            assert len(calls) <= 1  # one batched forward (zero when n == 1)

    def test_hf_model_path_single_forward(self):
        torch = pytest.importorskip("torch")
        from runia_core_tpu.llm import semantic_entropy

        texts = ["alpha", "beta", "alpha!", "gamma"]

        class FakeTokenizer:
            def __call__(self, premises, hypotheses, return_tensors, padding,
                         truncation):
                assert return_tensors == "pt" and padding
                return {"pair_ids": torch.tensor(
                    [[hash((p, h)) % 97] for p, h in zip(premises, hypotheses)]
                )}

        class FakeModel:
            def __init__(self):
                self.forward_count = 0

            def __call__(self, pair_ids):
                self.forward_count += 1
                # Label 2 (entailment) iff both texts share a first letter
                # bucket: derive logits purely from the hashed pair id.
                n = pair_ids.shape[0]
                logits = torch.zeros((n, 3))
                logits[:, (pair_ids[:, 0] % 3)] = 1.0
                out = type("Out", (), {})()
                out.logits = torch.stack(
                    [torch.nn.functional.one_hot(pair_ids[i, 0] % 3, 3).float()
                     for i in range(n)]
                )
                return out

        model = FakeModel()
        entropy, clusters = semantic_entropy(model, FakeTokenizer(), texts)
        assert model.forward_count == 1
        assert np.isfinite(entropy)
        covered = sorted(i for idxs in clusters.values() for i in idxs)
        assert covered == list(range(len(texts)))
