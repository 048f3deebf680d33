"""Speculative decoding tests.

The core property: greedy speculative output is EXACTLY the target model's
plain greedy decode — the draft only changes how many target forwards it
takes, never the tokens."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.llm import JaxGenerator, SpeculativeGenerator
from runia_core_tpu.models import LlamaLM
from runia_core_tpu.models.transformer import CausalLM


def make(model_cls, key, **kw):
    model = model_cls(**kw)
    params = model.init(jax.random.key(key), jnp.zeros((1, 8), jnp.int32))
    return model, params


@pytest.fixture(scope="module")
def models():
    target, tp = make(
        LlamaLM, 0, vocab_size=64, num_layers=3, num_heads=4, num_kv_heads=2,
        d_model=48, hidden_dim=96, max_len=128,
    )
    draft, dp = make(
        LlamaLM, 1, vocab_size=64, num_layers=1, num_heads=2, num_kv_heads=2,
        d_model=16, hidden_dim=32, max_len=128,
    )
    return target, tp, draft, dp


class TestSpeculative:
    @pytest.mark.parametrize("gamma", [1, 3, 5])
    def test_matches_plain_greedy(self, models, gamma):
        target, tp, draft, dp = models
        prompt = [3, 14, 15, 9, 2, 6]
        want = JaxGenerator(target, tp, max_new_tokens=12).generate(
            prompt_tokens=prompt, do_sample=False,
            output_attentions=False, output_hidden_states=False,
        )
        spec = SpeculativeGenerator(
            target, tp, draft, dp, gamma=gamma, max_new_tokens=12
        )
        got = spec.generate(prompt)
        np.testing.assert_array_equal(
            got["sequences"][0], np.asarray(want["sequences"][0])
        )

    def test_self_draft_accepts_nearly_everything(self, models):
        # Draft == target: greedy proposals agree except where the 1-token
        # and (gamma+1)-token forwards reassociate f32 sums across an
        # argmax near-tie — so acceptance is near 1, not pinned to 1.
        target, tp, *_ = models
        spec = SpeculativeGenerator(
            target, tp, target, tp, gamma=4, max_new_tokens=12
        )
        out = spec.generate([5, 1, 7])
        assert out["acceptance_rate"] >= 0.9
        assert out["rounds"] <= 4  # vs 11 target forwards without speculation

    def test_long_self_draft_no_cache_hole_decay(self, models):
        # Regression: fully-accepted rounds used to leave a zero-K/V hole
        # in the draft cache at the last proposal's slot, decaying
        # acceptance over long generations.
        target, tp, *_ = models
        spec = SpeculativeGenerator(
            target, tp, target, tp, gamma=4, max_new_tokens=40
        )
        out = spec.generate([5, 1, 7])
        assert out["acceptance_rate"] >= 0.9, out["acceptance_rate"]

    def test_log_probs_match_target(self, models):
        target, tp, draft, dp = models
        prompt = [10, 20, 30]
        want = JaxGenerator(target, tp, max_new_tokens=8).generate(
            prompt_tokens=prompt, do_sample=False,
            output_attentions=False, output_hidden_states=False,
        )
        got = SpeculativeGenerator(
            target, tp, draft, dp, gamma=3, max_new_tokens=8
        ).generate(prompt)
        # 1-token vs multi-token forward reassociation: small f32 drift
        np.testing.assert_allclose(
            got["log_probs"], np.asarray(want["log_probs"]).ravel(), atol=2e-2
        )

    def test_eos_stops(self, models):
        target, tp, draft, dp = models
        probe = SpeculativeGenerator(
            target, tp, draft, dp, gamma=2, max_new_tokens=10
        ).generate([1, 2, 3])
        eos = int(probe["tokens"][2])  # force stop at the 3rd emitted token
        out = SpeculativeGenerator(
            target, tp, draft, dp, gamma=2, max_new_tokens=10, eos_id=eos
        ).generate([1, 2, 3])
        assert int(out["tokens"][-1]) == eos
        assert len(out["tokens"]) <= 4

    def test_works_with_causallm(self):
        target, tp = make(CausalLM, 0, vocab_size=64, num_layers=2,
                          num_heads=2, d_model=32, max_len=64)
        draft, dp = make(CausalLM, 1, vocab_size=64, num_layers=1,
                         num_heads=2, d_model=16, max_len=64)
        want = JaxGenerator(target, tp, max_new_tokens=6).generate(
            prompt_tokens=[4, 8, 15], do_sample=False,
            output_attentions=False, output_hidden_states=False,
        )
        got = SpeculativeGenerator(
            target, tp, draft, dp, gamma=2, max_new_tokens=6
        ).generate([4, 8, 15])
        np.testing.assert_array_equal(
            got["sequences"][0], np.asarray(want["sequences"][0])
        )


class TestSampledSpeculative:
    def test_round_emits_exact_target_distribution(self):
        """The canonical correctness property of rejection-based
        speculative sampling: the FIRST emitted token of a round is an
        exact sample from the target distribution, whatever the draft is."""
        from runia_core_tpu.llm.speculative import speculative_sample_round

        V, g = 8, 3
        rng = np.random.RandomState(0)
        draft_p = rng.dirichlet(np.ones(V), size=g).astype(np.float32)
        target_p = rng.dirichlet(np.ones(V), size=g + 1).astype(np.float32)

        n = 20000
        keys = jax.random.split(jax.random.key(1), n)

        def one(key):
            kp, kr = jax.random.split(key)
            proposals = jax.random.categorical(
                kp, jnp.log(draft_p), axis=-1
            ).astype(jnp.int32)
            _, emitted = speculative_sample_round(
                proposals, jnp.asarray(draft_p), jnp.asarray(target_p), kr
            )
            return emitted[0]

        first = np.asarray(jax.jit(jax.vmap(one))(keys))
        freq = np.bincount(first, minlength=V) / n
        tv = 0.5 * np.abs(freq - target_p[0]).sum()
        assert tv < 0.02, (tv, freq, target_p[0])

    def test_sampled_generate_runs_and_differs_by_key(self, models):
        target, tp, draft, dp = models
        spec = SpeculativeGenerator(
            target, tp, draft, dp, gamma=3, max_new_tokens=10,
            do_sample=True, temperature=1.0,
        )
        a = spec.generate([3, 1, 4], key=jax.random.key(0))
        b = spec.generate([3, 1, 4], key=jax.random.key(1))
        assert np.isfinite(a["log_probs"]).all()
        assert len(a["tokens"]) == 10
        assert not np.array_equal(a["tokens"], b["tokens"])

    def test_sampled_self_draft_accepts_mostly(self, models):
        target, tp, *_ = models
        spec = SpeculativeGenerator(
            target, tp, target, tp, gamma=4, max_new_tokens=12,
            do_sample=True,
        )
        out = spec.generate([5, 1, 7], key=jax.random.key(2))
        # p_t == p_d -> acceptance prob 1 up to float drift
        assert out["acceptance_rate"] >= 0.75

    def test_generate_samples_vmapped(self, models):
        target, tp, draft, dp = models
        spec = SpeculativeGenerator(
            target, tp, draft, dp, gamma=3, max_new_tokens=8, do_sample=True
        )
        out = spec.generate_samples([2, 7, 1], num_samples=6,
                                    key=jax.random.key(3))
        assert out["sequences"].shape == (6, 3 + 8)
        assert out["tokens"].shape == (6, 8)
        assert (out["lengths"] == 8).all()  # no eos configured
        # samples differ across rows
        assert len({tuple(r) for r in out["tokens"].tolist()}) > 1
        assert np.isfinite(out["log_probs"]).all()

    def test_generate_samples_requires_sampling(self, models):
        target, tp, draft, dp = models
        spec = SpeculativeGenerator(target, tp, draft, dp, max_new_tokens=4)
        with pytest.raises(ValueError):
            spec.generate_samples([1, 2], num_samples=2)

    def test_repeated_sampled_calls_differ(self, models):
        target, tp, draft, dp = models
        spec = SpeculativeGenerator(
            target, tp, draft, dp, gamma=2, max_new_tokens=8, do_sample=True
        )
        a = spec.generate([3, 1, 4])
        b = spec.generate([3, 1, 4])
        assert not np.array_equal(a["tokens"], b["tokens"])

    def test_context_window_warning(self, models):
        target, tp, draft, dp = models  # max_len=128
        spec = SpeculativeGenerator(
            target, tp, draft, dp, gamma=2, max_new_tokens=126
        )
        with pytest.warns(UserWarning, match="context window"):
            spec.generate(list(range(8)))

    def test_samples_padding_uses_last_token(self, models):
        target, tp, draft, dp = models
        probe = SpeculativeGenerator(
            target, tp, draft, dp, gamma=2, max_new_tokens=10, do_sample=True
        ).generate_samples([1, 2, 3], num_samples=4, key=jax.random.key(0))
        eos = int(probe["tokens"][0][3])
        out = SpeculativeGenerator(
            target, tp, draft, dp, gamma=2, max_new_tokens=10,
            do_sample=True, eos_id=eos,
        ).generate_samples([1, 2, 3], num_samples=4, key=jax.random.key(0))
        for i in range(4):
            n = int(out["lengths"][i])
            if n < out["tokens"].shape[1]:
                # padding repeats the sample's own final token
                assert (out["tokens"][i, n:] == out["tokens"][i, n - 1]).all()
                assert np.isneginf(out["log_probs"][i, n:]).all()

    def test_generate_prompts_matches_per_prompt_greedy(self, models):
        target, tp, draft, dp = models
        spec = SpeculativeGenerator(
            target, tp, draft, dp, gamma=2, max_new_tokens=6
        )
        prompts = [[1, 2, 3, 4], [9, 8, 7, 6], [4, 4, 4, 4]]
        out = spec.generate_prompts(prompts)
        assert out["sequences"].shape == (3, 4 + 6)
        for i, pr in enumerate(prompts):
            single = spec.generate(pr)
            np.testing.assert_array_equal(out["tokens"][i], single["tokens"])

    def test_generate_prompts_rejects_ragged(self, models):
        target, tp, draft, dp = models
        spec = SpeculativeGenerator(target, tp, draft, dp, max_new_tokens=4)
        with pytest.raises(ValueError):
            spec.generate_prompts([[1, 2], [1, 2, 3]])
