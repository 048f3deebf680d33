"""Lane-batched chunked prefill + per-request decoding modes.

prefill_lanes > 1 advances several mid-prefill slots per program call (one
(W, C) forward); results must match the per-slot program. Per-request
``sample`` flags let one do_sample engine serve greedy requests — the
merged UncertaintyServer drain rides both features.
"""

import numpy as np
import pytest

import jax

from runia_core_tpu.llm.continuous import ContinuousBatchingEngine
from runia_core_tpu.models import LlamaLM

VOCAB = 64
MAX_NEW = 8


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaLM(vocab_size=VOCAB, num_layers=2, num_heads=4,
                    num_kv_heads=2, d_model=32, hidden_dim=64, max_len=128)
    params = model.init(jax.random.key(0), np.zeros((1, 8), np.int32))
    return model, params


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.RandomState(5)
    return [list(rng.randint(1, VOCAB, rng.randint(3, 24)))
            for _ in range(7)]


class TestPrefillLanes:
    @pytest.mark.parametrize("defer", [False, True])
    def test_lanes_match_per_slot_program(self, model_and_params, prompts,
                                          defer):
        model, params = model_and_params
        kw = dict(num_slots=3, max_ctx=64, max_new_tokens=MAX_NEW,
                  chunk_tokens=4, prefill_chunk=8, defer_fetch=defer)
        ref = ContinuousBatchingEngine(
            model, params, prefill_lanes=1, **kw
        ).generate_all(prompts)
        got = ContinuousBatchingEngine(
            model, params, prefill_lanes=3, **kw
        ).generate_all(prompts)
        for i, (r, o) in enumerate(zip(ref, got)):
            assert o["tokens"] == r["tokens"], f"prompt {i}"
            np.testing.assert_allclose(o["log_probs"], r["log_probs"],
                                       rtol=1e-5, atol=1e-6)

    def test_lanes_with_prefix_cache_and_budgets(self, model_and_params,
                                                 prompts):
        model, params = model_and_params
        budgets = [2, 7, 1, 8, 3, 5, 4]
        kw = dict(num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
                  chunk_tokens=3, prefill_chunk=8, prefix_cache=True)
        outs = []
        for lanes in (1, 2):
            eng = ContinuousBatchingEngine(model, params,
                                           prefill_lanes=lanes, **kw)
            ids = [eng.submit(p, b) for p, b in zip(prompts, budgets)]
            eng.run_until_drained()
            outs.append([eng.result(i) for i in ids])
        for i, (r, o) in enumerate(zip(*outs)):
            assert o["tokens"] == r["tokens"], f"request {i}"

    def test_lane_hidden_collection_matches(self, model_and_params,
                                            prompts):
        model, params = model_and_params
        kw = dict(num_slots=3, max_ctx=64, max_new_tokens=MAX_NEW,
                  chunk_tokens=4, prefill_chunk=8, collect_hidden=-1)
        ref = ContinuousBatchingEngine(
            model, params, prefill_lanes=1, **kw
        ).generate_all(prompts[:5])
        got = ContinuousBatchingEngine(
            model, params, prefill_lanes=3, **kw
        ).generate_all(prompts[:5])
        for r, o in zip(ref, got):
            np.testing.assert_allclose(o["hidden"], r["hidden"],
                                       rtol=1e-5, atol=1e-6)


class TestPerRequestSampling:
    def test_greedy_requests_on_sampled_engine_match_greedy_engine(
        self, model_and_params, prompts
    ):
        """sample=False requests on a do_sample engine must reproduce the
        pure-greedy engine exactly, even interleaved with sampled ones."""
        model, params = model_and_params
        kw = dict(num_slots=3, max_ctx=64, max_new_tokens=MAX_NEW,
                  chunk_tokens=4)
        greedy = ContinuousBatchingEngine(model, params, **kw)
        g_ids = [greedy.submit(p) for p in prompts]
        greedy.run_until_drained()

        mixed = ContinuousBatchingEngine(
            model, params, do_sample=True, temperature=0.9,
            key=jax.random.key(3), **kw,
        )
        m_ids = []
        for p in prompts:
            m_ids.append(mixed.submit(p, sample=False))
            mixed.submit(p, sample=True)
        mixed.run_until_drained()
        for gi, mi in zip(g_ids, m_ids):
            assert (mixed.result(mi)["tokens"]
                    == greedy.result(gi)["tokens"])

    def test_sample_true_on_greedy_engine_raises(self, model_and_params):
        model, params = model_and_params
        eng = ContinuousBatchingEngine(model, params, num_slots=2,
                                       max_ctx=64, max_new_tokens=MAX_NEW)
        with pytest.raises(ValueError, match="greedy engine"):
            eng.submit([1, 2, 3], sample=True)


class TestFusedLPT:
    def test_fused_lpt_returns_caller_order(self):
        """admission='lpt' reorders the fused drain's on-device request
        table by budget; results must come back in the caller's order and
        match the fifo drain per request (greedy streams are independent
        of admission order).

        Runs in a SUBPROCESS: compiling this particular fused while-loop
        late in the full suite segfaults XLA's CPU compiler
        (deterministically, at the same backend_compile frame, while the
        same compile succeeds in a fresh or medium-sized process) — a
        compiler-state issue isolation sidesteps without losing the
        property."""
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = """
import sys
sys.path.insert(0, {repo!r})
import os
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from runia_core_tpu.llm.continuous import ContinuousBatchingEngine
from runia_core_tpu.models import LlamaLM

model = LlamaLM(vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
                d_model=32, hidden_dim=64, max_len=128)
params = model.init(jax.random.key(0), np.zeros((1, 8), np.int32))
rng = np.random.RandomState(5)
prompts = [list(rng.randint(1, 64, rng.randint(3, 24))) for _ in range(7)]
budgets = [2, 8, 1, 7, 3, 6, 4]
kw = dict(num_slots=2, max_ctx=64, max_new_tokens=8, chunk_tokens=4,
          prefill_chunk=8)
fifo = ContinuousBatchingEngine(model, params, **kw)
lpt = ContinuousBatchingEngine(model, params, admission="lpt", **kw)
a = fifo.generate_all_fused(prompts, budgets, prefill_lanes=1)
b = lpt.generate_all_fused(prompts, budgets, prefill_lanes=1)
for i, (ra, rb) in enumerate(zip(a, b)):
    assert rb["tokens"] == ra["tokens"], i
    assert len(rb["tokens"]) == budgets[i]
print("LPT-ORDER-OK")
""".format(repo=repo)
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "LPT-ORDER-OK" in proc.stdout


class TestMergedUncertaintyServer:
    def test_merged_matches_two_engine_scores(self, model_and_params,
                                              prompts):
        """The merged drain's deterministic scores must equal a dedicated
        greedy engine's (the two-engine layout it replaced), and sampled
        methods must be well-formed."""
        from runia_core_tpu.llm.serve_uncertainty import UncertaintyServer

        model, params = model_and_params
        requests = [
            {"method_name": "perplexity"},
            {"method_name": "generation_entropy"},
            {"method_name": "RAUQ", "token_aggregation": "original",
             "head_aggregation": "original"},
            {"method_name": "normalized_entropy"},
            {"method_name": "eigen_score", "layer_index": -1},
        ]
        server = UncertaintyServer(
            model, params, None, requests, num_samples=3,
            max_new_tokens=MAX_NEW,
            engine_kwargs=dict(num_slots=4, chunk_tokens=4,
                               prefill_chunk=8),
            max_prompt_len=max(len(p) for p in prompts),
        )
        assert server._merged and server.samp_engine is None
        texts, scores = server.serve(prompts[:4])

        det = ContinuousBatchingEngine(
            model, params, num_slots=4, max_ctx=server.det_engine.max_ctx,
            max_new_tokens=MAX_NEW, chunk_tokens=4, prefill_chunk=8,
            prefix_cache=True, collect_rauq=True,
            rauq_alpha=0.3,  # the server's compute_uncertainties default
        ).generate_all(prompts[:4])
        for t, s, d in zip(texts, scores, det):
            assert list(t) == d["tokens"]
            np.testing.assert_allclose(s["perplexity"], d["perplexity"],
                                       rtol=1e-6)
            np.testing.assert_allclose(
                s["RAUQ_original_original"], d["rauq"], rtol=1e-6
            )
            assert np.isfinite(s["normalized_entropy"])
            assert np.isfinite(s["eigen_score"])
