"""LLM serving shapes: static batching, continuous batching, conversion.

Three deployment patterns on one small Llama (runs on CPU or TPU unchanged;
swap in ``convert_hf_llama(your_checkpoint)`` for real weights):

1. ``GenerationService`` — dynamic request coalescing into static batches
   (good for uniform traffic with similar budgets).
2. ``ContinuousBatchingEngine`` — fixed decode slots over one shared KV
   cache, refilled per-request the moment EOS or the request's own budget
   hits (the Orca/vLLM model; good for mixed budgets / streaming traffic).
3. The same prompts through plain ``JaxGenerator.generate`` to show the
   engine is token-identical per request.

    python examples/demo_llm_serving.py
"""

import os as _os
import sys as _sys

# Allow `python examples/<demo>.py` from a fresh checkout (the script
# dir, not the cwd, lands on sys.path; installed packages are found).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax

# The demo asserts token identity between the engine and the single-prompt
# decoder. Their programs batch/chunk the same math differently, and the
# TPU's default f32 matmul precision (bf16 passes) leaves enough slack for
# argmax near-ties to flip between program shapes — exact f32 keeps the
# identity checks meaningful on every backend.
jax.config.update("jax_default_matmul_precision", "highest")

from runia_core_tpu.llm import (
    ContinuousBatchingEngine,
    GenerationService,
    JaxGenerator,
)
from runia_core_tpu.models import LlamaLM

VOCAB, MAX_NEW = 512, 12

model = LlamaLM(vocab_size=VOCAB, num_layers=2, num_heads=4, num_kv_heads=2,
                d_model=64, hidden_dim=128, max_len=256)
params = jax.jit(model.init)(jax.random.key(0), np.zeros((1, 8), np.int32))

rng = np.random.RandomState(0)
prompts = [list(rng.randint(1, VOCAB, rng.randint(4, 24))) for _ in range(6)]
budgets = [4, 12, 7, 9, 3, 12]

# -- 1. static dynamic-batching service --------------------------------------
service = GenerationService(
    JaxGenerator(model, params, max_new_tokens=MAX_NEW), max_batch=4
)
futures = [service.submit(p) for p in prompts]
static_out = [f.result() for f in futures]
service.close()
print("GenerationService:",
      [int(r["sequences"].shape[1] - r["prompt_length"]) for r in static_out],
      "generated tokens per request (all pay the full budget)")

# -- 2. continuous batching with per-request budgets --------------------------
engine = ContinuousBatchingEngine(
    model, params, num_slots=3, max_ctx=128, max_new_tokens=MAX_NEW,
    chunk_tokens=4,
)
ids = [engine.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
engine.run_until_drained()
engine_out = [engine.result(i) for i in ids]
print("ContinuousBatchingEngine:",
      [len(r["tokens"]) for r in engine_out],
      "generated tokens per request (each stops at its own budget)")

# -- 3. per-request parity vs the single-prompt decoder -----------------------
gen = JaxGenerator(model, params, max_new_tokens=MAX_NEW)
for i, (p, b) in enumerate(zip(prompts, budgets)):
    ref = gen.generate(p, do_sample=False, output_attentions=False,
                       output_hidden_states=False)
    ref_toks = np.asarray(ref["sequences"][0, len(p):]).tolist()[:b]
    assert engine_out[i]["tokens"] == ref_toks, i
print("engine output is token-identical to the single-prompt decoder")

# -- 4. the full production config: chunked prefill + prefix cache +
#       speculative decoding + per-request uncertainty ------------------------
draft = LlamaLM(vocab_size=VOCAB, num_layers=1, num_heads=2, num_kv_heads=1,
                d_model=32, hidden_dim=64, max_len=256)
draft_params = jax.jit(draft.init)(jax.random.key(1),
                                   np.zeros((1, 8), np.int32))
system = list(rng.randint(1, VOCAB, 24))  # shared system prompt
agent_prompts = [system + list(rng.randint(1, VOCAB, rng.randint(3, 10)))
                 for _ in range(5)]
prod = ContinuousBatchingEngine(
    model, params, num_slots=3, max_ctx=128, max_new_tokens=MAX_NEW,
    chunk_tokens=10,
    prefill_chunk=8,       # one compiled prefill shape; long admissions
                           # stall in-flight decodes by at most one chunk
    prefix_cache=True,     # shared system prompts skip their prefill
    draft_model=draft, draft_params=draft_params, gamma=3,  # speculative
)
prod_out = prod.generate_all(agent_prompts)
for i, (p, res) in enumerate(zip(agent_prompts, prod_out)):
    ref = gen.generate(p, do_sample=False, output_attentions=False,
                       output_hidden_states=False)
    assert res["tokens"] == np.asarray(
        ref["sequences"][0, len(p):]
    ).tolist(), i
print(f"speculative engine: token-identical, {prod.prefix_hits} prefix-cache "
      "hits; per-request uncertainty:",
      [round(r["perplexity"], 2) for r in prod_out], "(perplexity)")
