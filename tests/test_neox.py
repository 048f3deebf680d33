"""GPT-NeoX/Pythia conversion: logits parity, KV-cache decode, scores."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.models import NeoXLM, convert_hf_gpt_neox

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _hf(seed=0, **kw):
    base = dict(
        vocab_size=96, hidden_size=32, intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, rotary_pct=0.25,
        use_parallel_residual=True,
    )
    base.update(kw)
    torch.manual_seed(seed)
    return transformers.GPTNeoXForCausalLM(
        transformers.GPTNeoXConfig(**base)
    ).eval()


class TestConvertGPTNeoX:
    @pytest.fixture(scope="class")
    def pythia(self):
        return _hf()

    def test_logits_match_torch(self, pythia):
        model, params = convert_hf_gpt_neox(pythia)
        assert model.parallel_residual and model.rotary_pct == 0.25
        toks = np.random.RandomState(0).randint(1, 96, (2, 12))
        with torch.no_grad():
            want = pythia(torch.tensor(toks)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(toks))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

    def test_sequential_residual_and_full_rotary(self):
        hf = _hf(seed=1, use_parallel_residual=False, rotary_pct=1.0)
        model, params = convert_hf_gpt_neox(hf)
        toks = np.random.RandomState(1).randint(1, 96, (1, 9))
        with torch.no_grad():
            want = hf(torch.tensor(toks)).logits.numpy()
        got, *_ = model.apply(params, jnp.asarray(toks))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

    def test_greedy_decode_matches_hf_generate(self, pythia):
        from runia_core_tpu.llm.generate import JaxGenerator

        model, params = convert_hf_gpt_neox(pythia)
        gen = JaxGenerator(model, params, max_new_tokens=6)
        prompt = [5, 11, 40]
        ours = gen.generate(prompt, do_sample=False,
                            output_attentions=False,
                            output_hidden_states=False)["sequences"][0]
        with torch.no_grad():
            hf_out = pythia.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
            )[0].numpy()
        np.testing.assert_array_equal(np.asarray(ours), hf_out)

    def test_uncertainty_scores_run(self, pythia):
        from runia_core_tpu.llm.generate import JaxGenerator
        from runia_core_tpu.llm.scores import compute_uncertainties

        model, params = convert_hf_gpt_neox(pythia)
        gen = JaxGenerator(model, params, max_new_tokens=4)
        _, scores = compute_uncertainties(
            gen, None, [3, 9, 27],
            [{"method_name": "perplexity"},
             {"method_name": "RAUQ"}],
            num_samples=2,
        )
        assert np.isfinite(np.asarray(scores["perplexity"])).all()
        assert np.isfinite(
            np.asarray(scores["RAUQ_mean_all_tokens_rollout"])
        ).all()
