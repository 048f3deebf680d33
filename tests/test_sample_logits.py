"""top-k / nucleus sampling (HF generate semantics, jit-safe)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.llm.generate import JaxGenerator, sample_logits
from runia_core_tpu.models import LlamaLM


class TestSampleLogits:
    def setup_method(self):
        self.logits = jnp.asarray(
            np.log(np.array([[0.4, 0.3, 0.15, 0.1, 0.05]], np.float32))
        )

    def _draw(self, n, **kw):
        keys = jax.random.split(jax.random.key(0), n)
        return np.asarray(
            jax.vmap(lambda k: sample_logits(k, self.logits, **kw))(keys)
        ).ravel()

    def test_top_k_1_is_argmax(self):
        assert set(self._draw(64, top_k=1)) == {0}

    def test_tiny_top_p_is_argmax(self):
        # top_p below the max prob keeps only the crossing (first) token
        assert set(self._draw(64, top_p=0.1)) == {0}

    def test_top_k_restricts_support(self):
        draws = set(self._draw(256, top_k=3))
        assert draws <= {0, 1, 2} and len(draws) == 3

    def test_top_p_keeps_crossing_token(self):
        # cum probs: .4, .7, .85 — top_p=0.7 keeps {0, 1} (1 crosses 0.7
        # with cumulative-before 0.4 < 0.7), drops the rest
        draws = set(self._draw(256, top_p=0.7))
        assert draws == {0, 1}

    def test_filters_compose(self):
        # top_k=2 first -> {0, 1}; then top_p=0.45 over the renormalized?
        # No: HF applies top_p on the filtered logits' softmax (.571, .429
        # after top-k) — 0.45 keeps only token 0 (cum-before of 1 is .571).
        draws = set(self._draw(128, top_k=2, top_p=0.45))
        assert draws == {0}

    def test_disabled_filters_sample_full_support(self):
        draws = set(self._draw(512))
        assert draws == {0, 1, 2, 3, 4}

    def test_top_k_above_vocab_clamps(self):
        # HF's TopKLogitsWarper clamps k to the vocab size; an HF
        # GenerationConfig materializes its default top_k=50 even when the
        # user never set it, so small-vocab models exercise this constantly.
        draws = set(self._draw(512, top_k=50))
        assert draws == {0, 1, 2, 3, 4}

    def test_top_p_zero_is_argmax(self):
        # min_tokens_to_keep=1 (HF): top_p<=0 degrades to greedy rather
        # than masking every logit and emitting vocab id 0 unconditionally.
        shifted = jnp.roll(self.logits, 2, axis=-1)  # argmax at index 2
        keys = jax.random.split(jax.random.key(3), 64)
        draws = set(np.asarray(jax.vmap(
            lambda k: sample_logits(k, shifted, top_p=0.0))(keys)).ravel())
        assert draws == {2}

    def test_jit_and_batch_shapes(self):
        batched = jnp.broadcast_to(self.logits, (4, 5))
        out = jax.jit(sample_logits, static_argnums=(2, 3, 4))(
            jax.random.key(1), batched, 1.0, 2, 1.0
        )
        assert out.shape == (4,)


class TestGeneratorSamplingKnobs:
    @pytest.fixture(scope="class")
    def gen(self):
        model = LlamaLM(vocab_size=32, num_layers=1, num_heads=2,
                        num_kv_heads=1, d_model=16, hidden_dim=32, max_len=32)
        params = model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
        return JaxGenerator(model, params, max_new_tokens=6)

    def test_generate_top_k1_matches_greedy(self, gen):
        greedy = gen.generate([1, 2, 3], do_sample=False,
                              output_attentions=False,
                              output_hidden_states=False)
        k1 = gen.generate([1, 2, 3], do_sample=True, top_k=1,
                          key=jax.random.key(5), output_attentions=False,
                          output_hidden_states=False)
        np.testing.assert_array_equal(k1["sequences"], greedy["sequences"])

    def test_gen_config_knobs_reach_the_sampled_pass(self, gen):
        from runia_core_tpu.llm.generate import _sampling_kwargs

        assert _sampling_kwargs(None) == {}
        assert _sampling_kwargs({"temperature": 0.7, "top_k": 5}) == {
            "temperature": 0.7, "top_k": 5,
        }

        class Cfg:
            temperature = 2.0
            top_p = 0.9
            top_k = None

        assert _sampling_kwargs(Cfg()) == {"temperature": 2.0, "top_p": 0.9}

    def test_compute_uncertainties_honors_gen_config(self, gen):
        from runia_core_tpu.llm.scores import compute_uncertainties

        # top_k=1 makes every sample greedy -> zero lexical variance ->
        # normalized_entropy equals the deterministic sequence's.
        _, s1 = compute_uncertainties(
            gen, None, [1, 2, 3], [{"method_name": "normalized_entropy"}],
            num_samples=3, gen_config={"top_k": 1},
        )
        assert np.isfinite(np.asarray(s1["normalized_entropy"])).all()

    def test_generate_batch_top_p1e9_matches_plain_sampling(self, gen):
        kw = dict(do_sample=True, key=jax.random.key(7), output_scores=False)
        plain = gen.generate_batch([[1, 2], [3, 4, 5]], **kw)
        nucleus = gen.generate_batch([[1, 2], [3, 4, 5]], top_p=1.0, **kw)
        np.testing.assert_array_equal(
            plain["sequences"], nucleus["sequences"]
        )
