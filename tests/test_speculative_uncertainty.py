"""compute_uncertainties over the speculative backend.

The reference's multi-sample uncertainty pattern (N sampled generations
feeding normalized/semantic entropy, reference scores.py:478-504) with the
fused speculative loop doing the sampling. The deterministic-trace scores
must be identical to the plain JaxGenerator backend on the same target
model; sampled scores must be well-formed; eigen_score must fail loudly
(the fused loop emits no hidden states).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.llm.generate import JaxGenerator
from runia_core_tpu.llm.scores import compute_uncertainties
from runia_core_tpu.llm.speculative import SpeculativeGenerator
from runia_core_tpu.models import LlamaLM

VOCAB = 64
MAX_NEW = 6


@pytest.fixture(scope="module")
def models():
    target = LlamaLM(vocab_size=VOCAB, num_layers=2, num_heads=4,
                     num_kv_heads=2, d_model=32, hidden_dim=64, max_len=64)
    t_params = target.init(jax.random.key(0), np.zeros((1, 8), np.int32))
    draft = LlamaLM(vocab_size=VOCAB, num_layers=1, num_heads=2,
                    num_kv_heads=1, d_model=16, hidden_dim=32, max_len=64)
    d_params = draft.init(jax.random.key(1), np.zeros((1, 8), np.int32))
    return target, t_params, draft, d_params


REQUESTS = [
    {"method_name": "perplexity"},
    {"method_name": "RAUQ"},
    {"method_name": "normalized_entropy"},
    {"method_name": "semantic_entropy"},
]


class TestSpeculativeUncertainty:
    def test_scores_and_deterministic_parity(self, models):
        target, t_params, draft, d_params = models
        prompt = [1, 5, 9, 12]
        spec = SpeculativeGenerator(target, t_params, draft, d_params,
                                    gamma=3, max_new_tokens=MAX_NEW,
                                    do_sample=True)
        equivalence = lambda a, b: a == b
        text_s, scores_s = compute_uncertainties(
            spec, None, prompt, REQUESTS, num_samples=3,
            entailment_model=equivalence, entailment_tokenizer=None,
        )
        gen = JaxGenerator(target, t_params, max_new_tokens=MAX_NEW)
        text_g, scores_g = compute_uncertainties(
            gen, None, prompt, REQUESTS, num_samples=3,
            entailment_model=equivalence, entailment_tokenizer=None,
        )

        # Same target model, same greedy deterministic trace.
        assert text_s == text_g
        for name in ("perplexity", "RAUQ_mean_all_tokens_rollout"):
            np.testing.assert_allclose(
                np.asarray(scores_s[name], np.float64).ravel(),
                np.asarray(scores_g[name], np.float64).ravel(),
                rtol=1e-5, atol=1e-5, err_msg=name,
            )
        # Sampled scores are RNG-dependent but must be finite & well-formed.
        for name in ("normalized_entropy", "semantic_entropy"):
            assert np.isfinite(float(np.asarray(scores_s[name]).ravel()[0]))
        assert isinstance(scores_s["clusters"], dict)

    def test_eigen_score_rejected(self, models):
        target, t_params, draft, d_params = models
        spec = SpeculativeGenerator(target, t_params, draft, d_params,
                                    gamma=3, max_new_tokens=MAX_NEW,
                                    do_sample=True)
        with pytest.raises(ValueError, match="eigen_score"):
            compute_uncertainties(
                spec, None, [1, 2, 3], [{"method_name": "eigen_score"}],
                num_samples=2,
            )

    def test_greedy_spec_requires_do_sample(self, models):
        target, t_params, draft, d_params = models
        spec = SpeculativeGenerator(target, t_params, draft, d_params,
                                    gamma=3, max_new_tokens=MAX_NEW)
        with pytest.raises(ValueError, match="do_sample"):
            compute_uncertainties(
                spec, None, [1, 2, 3],
                [{"method_name": "normalized_entropy"}], num_samples=2,
            )

    def test_deterministic_only_requests_work_without_sampling(self, models):
        """Deterministic-only scores run on a greedy SpeculativeGenerator."""
        target, t_params, draft, d_params = models
        spec = SpeculativeGenerator(target, t_params, draft, d_params,
                                    gamma=3, max_new_tokens=MAX_NEW)
        _, scores = compute_uncertainties(
            spec, None, [1, 2, 3], [{"method_name": "perplexity"}],
        )
        assert np.isfinite(float(scores["perplexity"]))

    def test_validation_happens_before_any_decode(self, models, monkeypatch):
        """The capability error must fire with ZERO decode work — before the
        deterministic pass runs (VERDICT r2 item 8)."""
        import runia_core_tpu.llm.scores as scores_mod

        def explode(*a, **k):  # pragma: no cover - must never be reached
            raise AssertionError("decode ran before request validation")

        monkeypatch.setattr(scores_mod, "run_generation", explode, raising=False)
        import runia_core_tpu.llm.generate as gen_mod
        monkeypatch.setattr(gen_mod, "run_generation", explode)

        target, t_params, draft, d_params = models
        spec = SpeculativeGenerator(target, t_params, draft, d_params,
                                    gamma=3, max_new_tokens=MAX_NEW,
                                    do_sample=True)
        with pytest.raises(ValueError, match="eigen_score"):
            compute_uncertainties(
                spec, None, [1, 2, 3], [{"method_name": "eigen_score"}],
                num_samples=2,
            )

    def test_unknown_method_rejected_before_decode(self, models, monkeypatch):
        import runia_core_tpu.llm.generate as gen_mod

        def explode(*a, **k):  # pragma: no cover
            raise AssertionError("decode ran for an unknown method")

        monkeypatch.setattr(gen_mod, "run_generation", explode)
        target, t_params, _, _ = models
        gen = JaxGenerator(target, t_params, max_new_tokens=MAX_NEW)
        with pytest.raises(KeyError, match="no_such_method"):
            compute_uncertainties(
                gen, None, [1, 2, 3], [{"method_name": "no_such_method"}],
            )
