"""LLM hallucination-score demo.

Runs all six uncertainty scores over generations from either a HuggingFace
causal LM (pass --hf-model, mirrors the reference example) or the built-in
JAX CausalLM with random weights (default, fully offline).
"""

import os as _os
import sys as _sys

# Allow `python examples/<demo>.py` from a fresh checkout (the script
# dir, not the cwd, lands on sys.path; installed packages are found).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np
import jax

from runia_core_tpu.llm import JaxGenerator, compute_uncertainties


class IdentityTokenizer:
    def encode(self, tokens):
        return list(tokens)

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


UNCERTAINTY_REQUESTS = [
    {"method_name": "eigen_score"},
    {"method_name": "normalized_entropy"},
    {"method_name": "perplexity"},
    {"method_name": "generation_entropy"},
    {
        "method_name": "RAUQ",
        "token_aggregation": "original",
        "head_aggregation": "mean_heads",
        "alphas": [0.2, 0.4, 0.6],
        "ablation": True,
    },
    {
        "method_name": "RAUQ",
        "token_aggregation": "original",
        "head_aggregation": "rollout",
        "alphas": [0.4],
        "ablation": False,
    },
]


def run_jax_demo(num_samples: int):
    from runia_core_tpu.models.transformer import CausalLM

    model = CausalLM(vocab_size=512, num_layers=16, num_heads=4, d_model=128,
                     max_len=128)
    params = jax.jit(model.init)(jax.random.key(0), np.zeros((1, 8), np.int32))
    generator = JaxGenerator(model, params, max_new_tokens=24)
    prompt = [11, 42, 7, 99, 3]
    return compute_uncertainties(
        generator, IdentityTokenizer(), prompt, UNCERTAINTY_REQUESTS,
        num_samples=num_samples,
    )


def run_serving_uncertainty_demo():
    """Serving path: a BATCH of prompts scored through the continuous
    batching engine — deterministic scores from a greedy engine (RAUQ
    gathered in the decode loop) and the sampled passes sharing each
    prompt's prefill via the prefix cache. A persistent UncertaintyServer
    compiles the engines ONCE and serves batch after batch (one-shot
    serve_uncertainties rebuilds + re-jits them every call)."""
    from runia_core_tpu.llm import UncertaintyServer
    from runia_core_tpu.models import LlamaLM

    model = LlamaLM(vocab_size=512, num_layers=2, num_heads=4,
                    num_kv_heads=2, d_model=64, hidden_dim=128, max_len=256)
    params = jax.jit(model.init)(jax.random.key(0), np.zeros((1, 8), np.int32))
    server = UncertaintyServer(
        model, params, None,
        [{"method_name": "perplexity"},
         {"method_name": "RAUQ", "token_aggregation": "original",
          "head_aggregation": "original"},
         {"method_name": "normalized_entropy"}],
        num_samples=4, max_new_tokens=12, temperature=0.9,
        engine_kwargs=dict(num_slots=4, prefill_chunk=8, chunk_tokens=8),
        max_prompt_len=20,
    )
    rng = np.random.RandomState(4)
    for batch_no in range(2):  # batch 2 reuses every compiled program
        prompts = [list(rng.randint(1, 512, rng.randint(6, 20)))
                   for _ in range(4)]
        texts, scores = server.serve(prompts)
        print(f"Batch {batch_no}: uncertainty serving over "
              f"{len(prompts)} prompts:")
        for i, out in enumerate(scores):
            print(f"  prompt {i}: ppl={out['perplexity']:.3f} "
                  f"rauq={out['RAUQ_original_original']:.3f} "
                  f"norm_ent={out['normalized_entropy']:.3f}")


def run_batched_rauq_demo():
    """Throughput path: many prompts in ONE fused decode, RAUQ from the
    on-device prev-token attention taps."""
    from runia_core_tpu.llm import batched_rauq
    from runia_core_tpu.models.transformer import CausalLM

    model = CausalLM(vocab_size=512, num_layers=8, num_heads=4, d_model=128,
                     max_len=128)
    params = jax.jit(model.init)(jax.random.key(0), np.zeros((1, 8), np.int32))
    generator = JaxGenerator(model, params, max_new_tokens=16)
    prompts = [[11, 42, 7], [99, 3, 5, 8, 2], [100, 200], [7, 7, 7, 7]]
    out = generator.generate_batch(prompts, output_attentions=True)
    u = batched_rauq(out["log_probs"], out["prev_token_attention"], "original")
    u_mh = batched_rauq(out["log_probs"], out["prev_token_attention"],
                        "mean_heads", alphas=[0.3])
    print("Batched RAUQ over", len(prompts), "prompts (one fused program):")
    for i, (a, b) in enumerate(zip(u, u_mh)):
        print(f"  prompt {i}: original={a:.4f}  mean_heads={b:.4f}")


def run_hf_demo(model_name: str, prompt: str, num_samples: int, jax_backend=False):
    """HF checkpoint demo. ``jax_backend=True`` converts a Llama-family
    checkpoint onto the TPU-native LlamaLM (models.convert_hf_llama) and
    decodes with JaxGenerator instead of torch."""
    from transformers import AutoModelForCausalLM, AutoTokenizer, GenerationConfig

    tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = AutoModelForCausalLM.from_pretrained(
        model_name, attn_implementation="eager"
    )
    if jax_backend:
        from runia_core_tpu.models import convert_hf_llama

        jax_model, params = convert_hf_llama(model)
        generator = JaxGenerator(jax_model, params, max_new_tokens=50,
                                 eos_id=tokenizer.eos_token_id)
        requests = UNCERTAINTY_REQUESTS + [{"method_name": "semantic_entropy"}]
        return compute_uncertainties(
            generator, tokenizer, prompt, requests, num_samples=num_samples
        )
    gen_config = GenerationConfig(
        max_new_tokens=50, do_sample=True, top_p=0.9, temperature=1.0
    )
    requests = UNCERTAINTY_REQUESTS + [{"method_name": "semantic_entropy"}]
    return compute_uncertainties(
        model, tokenizer, prompt, requests, gen_config, num_samples=num_samples
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--hf-model", default=None,
                        help="HF model name (e.g. meta-llama/Llama-3.1-8B-Instruct)")
    parser.add_argument("--prompt", default="What is the capital of France?")
    parser.add_argument("--num-samples", type=int, default=10)
    parser.add_argument("--jax-backend", action="store_true",
                        help="convert the (Llama-family) HF checkpoint onto "
                             "the TPU-native LlamaLM and decode with "
                             "JaxGenerator")
    args = parser.parse_args()

    if args.hf_model:
        text, scores = run_hf_demo(args.hf_model, args.prompt,
                                   args.num_samples, args.jax_backend)
    else:
        text, scores = run_jax_demo(args.num_samples)
    print("Generated Text:", text)
    print("Uncertainty Scores:")
    for name, value in scores.items():
        print(f"  {name}: {value}")
    if not args.hf_model:
        run_batched_rauq_demo()
        run_serving_uncertainty_demo()


if __name__ == "__main__":
    main()
