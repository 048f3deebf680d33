"""Cross-backend LLM uncertainty smoke on a real HF model.

The reference runs ``compute_uncertainties`` on real HF checkpoints
(reference examples/demo_llm_uncertainty.py, scores.py:347-524). No network
egress here, so the "real HF model" is a locally built random-init
``LlamaForCausalLM`` — a genuine transformers model driven through the
genuine ``model.generate`` path, the same trace the reference consumes.

Two contracts are pinned:

  1. Backend agreement: ``compute_uncertainties`` on the HF-torch backend
     and on the JAX backend (``convert_hf_llama`` weights + JaxGenerator)
     produce the SAME deterministic generation trace and matching
     deterministic scores (perplexity, generation entropy, RAUQ).
  2. Sampled-trace numerics: per-token log-probs the JAX sampler reports are
     reproduced by teacher-forcing the same sampled sequences through the
     torch model (the sampled-score inputs are real, not backend artifacts).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("transformers")
import torch
import transformers

from runia_core_tpu.llm.generate import JaxGenerator
from runia_core_tpu.llm.scores import compute_uncertainties, eigen_score
from runia_core_tpu.models import convert_hf_llama

VOCAB = 97
MAX_NEW = 8


class ByteTokenizer:
    """Char-level tokenizer with the HF surface compute_uncertainties uses
    (callable -> BatchEncoding, encode/decode/batch_decode)."""

    def __call__(self, text, return_tensors=None):
        ids = self.encode(text)
        data = {
            "input_ids": torch.tensor([ids]),
            "attention_mask": torch.ones((1, len(ids)), dtype=torch.long),
        }
        return transformers.BatchEncoding(data)

    def encode(self, text):
        return [ord(c) % VOCAB for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + int(t) % 26) for t in ids)

    def batch_decode(self, seqs, skip_special_tokens=True):
        return [self.decode(s) for s in seqs]


@pytest.fixture(scope="module")
def backends():
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    model, params = convert_hf_llama(hf)
    gen = JaxGenerator(model, params, max_new_tokens=MAX_NEW, eos_id=None)
    return hf, gen, ByteTokenizer()


REQUESTS = [
    {"method_name": "perplexity"},
    {"method_name": "generation_entropy"},
    # Bare request: the aggregation defaults (mean_all_tokens, rollout) must
    # be applied consistently by both the dispatch fn and the score-name
    # builder (regression: the name builder used to KeyError on this).
    {"method_name": "RAUQ"},
    {"method_name": "normalized_entropy"},
    {"method_name": "eigen_score", "layer_index": -1},
    {"method_name": "semantic_entropy"},
]


class TestCrossBackendSmoke:
    def test_hf_and_jax_backends_agree(self, backends):
        hf, gen, tok = backends
        prompt = "the quick brown fox"
        gen_config = transformers.GenerationConfig(
            max_new_tokens=MAX_NEW,
            eos_token_id=None,
            pad_token_id=0,
            do_sample=False,
        )
        equivalence = lambda a, b: a == b

        hf_text, hf_scores = compute_uncertainties(
            hf, tok, prompt, REQUESTS, gen_config=gen_config, num_samples=4,
            entailment_model=equivalence, entailment_tokenizer=None,
        )
        jax_text, jax_scores = compute_uncertainties(
            gen, tok, prompt, REQUESTS, num_samples=4,
            entailment_model=equivalence, entailment_tokenizer=None,
        )

        # Same greedy trace: token-identical decode on both backends.
        assert hf_text == jax_text, (hf_text, jax_text)

        # Deterministic scores match across backends on that shared trace.
        for name in ("perplexity", "generation_entropy",
                     "RAUQ_mean_all_tokens_rollout"):
            a = np.asarray(hf_scores[name], dtype=np.float64).ravel()
            b = np.asarray(jax_scores[name], dtype=np.float64).ravel()
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3, err_msg=name)

        # Sampled scores use backend-local RNG, so values differ; both
        # backends must still produce finite, well-formed outputs.
        for scores in (hf_scores, jax_scores):
            for name in ("normalized_entropy", "eigen_score", "semantic_entropy"):
                val = np.asarray(scores[name], dtype=np.float64)
                assert np.isfinite(val).all(), (name, val)

    def test_jax_sampled_trace_matches_torch_teacher_forcing(self, backends):
        """Every sampled token's log-prob reported by the JAX backend must be
        what the torch model assigns to that token when teacher-forced."""
        hf, gen, tok = backends
        prompt_tokens = tok.encode("uncertain generation")
        n = 4
        out = gen.generate(
            prompt_tokens, num_return_sequences=n, do_sample=True,
            output_hidden_states=True,
        )
        seqs = np.asarray(out["sequences"])  # (n, P + MAX_NEW)
        p = len(prompt_tokens)

        with torch.no_grad():
            logits = hf(torch.tensor(seqs)).logits  # (n, T, V)
        logp = torch.log_softmax(logits[:, p - 1 : -1], dim=-1)
        want = (
            logp.gather(-1, torch.tensor(seqs[:, p:, None], dtype=torch.long))
            .squeeze(-1)
            .numpy()
        )
        np.testing.assert_allclose(out["log_probs"], want, rtol=1e-3, atol=1e-3)

        # The sampled hidden states feed eigen_score; it must be computable
        # and finite on the real trace.
        es = eigen_score(out["hidden_states"], layer_index=-1)
        assert np.isfinite(float(es))
