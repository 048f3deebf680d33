"""Continuous (in-flight) batching engine vs the single-prompt decoder.

Greedy decode through ContinuousBatchingEngine must be token-identical to
JaxGenerator.generate per prompt — slots share one KV cache but each rides
its own physical clock (the vector cache_index path of LlamaLM), so
cohabitation must not perturb numerics. Refill is exercised by submitting
more prompts than slots.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.llm.continuous import ContinuousBatchingEngine
from runia_core_tpu.llm.generate import JaxGenerator
from runia_core_tpu.models import LlamaLM

VOCAB = 64
MAX_NEW = 10


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaLM(vocab_size=VOCAB, num_layers=2, num_heads=4,
                    num_kv_heads=2, d_model=32, hidden_dim=64, max_len=128)
    params = model.init(jax.random.key(0), np.zeros((1, 8), np.int32))
    return model, params


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.RandomState(3)
    return [list(rng.randint(1, VOCAB, rng.randint(3, 20))) for _ in range(7)]


def reference_outputs(model, params, prompts, eos_id):
    gen = JaxGenerator(model, params, max_new_tokens=MAX_NEW, eos_id=eos_id)
    outs = []
    for p in prompts:
        out = gen.generate(p, do_sample=False, output_attentions=False,
                           output_hidden_states=False)
        toks = np.asarray(out["sequences"][0, len(p):]).tolist()
        lps = np.asarray(out["log_probs"]).ravel()
        if eos_id is not None and eos_id in toks:
            cut = toks.index(eos_id)
            toks, lps = toks[:cut], lps[:cut]
        outs.append((toks, lps))
    return outs


class TestContinuousBatching:
    def test_greedy_matches_single_prompt_with_refill(
        self, model_and_params, prompts
    ):
        model, params = model_and_params
        ref = reference_outputs(model, params, prompts, eos_id=None)

        # 3 slots < 7 prompts: every slot refills at least once.
        eng = ContinuousBatchingEngine(
            model, params, num_slots=3, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, eos_id=None,
        )
        results = eng.generate_all(prompts)
        for i, ((ref_toks, ref_lps), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"
            np.testing.assert_allclose(
                res["log_probs"], ref_lps[: len(res["tokens"])],
                rtol=1e-4, atol=1e-5, err_msg=f"prompt {i}",
            )
            assert res["prompt_length"] == len(prompts[i])

    def test_eos_stops_and_strips(self, model_and_params, prompts):
        model, params = model_and_params
        # Choose as EOS a token the greedy trace actually emits mid-sequence,
        # so the engine must stop that slot early and refill it.
        no_eos = reference_outputs(model, params, prompts, eos_id=None)
        eos_id = no_eos[0][0][min(2, len(no_eos[0][0]) - 1)]
        ref = reference_outputs(model, params, prompts, eos_id=eos_id)

        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=3, eos_id=eos_id,
        )
        results = eng.generate_all(prompts)
        for i, ((ref_toks, _), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"
            assert eos_id not in res["tokens"]

    def test_sampled_mode_well_formed(self, model_and_params, prompts):
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=4, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=5, do_sample=True, temperature=0.8,
            key=jax.random.key(7),
        )
        results = eng.generate_all(prompts[:5])
        for res in results:
            assert len(res["tokens"]) == MAX_NEW
            assert np.isfinite(res["log_probs"]).all()
            assert all(0 <= t < VOCAB for t in res["tokens"])

    def test_context_overflow_rejected_at_submit(self, model_and_params):
        """Validation fails fast at submit() — a bad request must not raise
        mid-drain and poison every other in-flight request's results."""
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=32, max_new_tokens=30,
        )
        with pytest.raises(ValueError, match="max_ctx"):
            eng.submit(list(range(1, 20)))

    def test_flash_model_chunked_prefill_token_identical(
        self, model_and_params, prompts, monkeypatch
    ):
        """use_flash engines are served through the valid-length flash
        kernel on their chunked-prefill path (ops/flash_prefill.py);
        greedy results must match the dense engine. The kernel normally
        engages at chunk >= 128 on TPU — the size gate is lowered here so
        the tiny CPU configuration actually exercises it (interpret
        mode)."""
        from runia_core_tpu.models import llama as llama_mod

        model, params = model_and_params
        monkeypatch.setattr(llama_mod, "_flash_available", lambda t: t >= 8)
        flash = LlamaLM(vocab_size=VOCAB, num_layers=2, num_heads=4,
                        num_kv_heads=2, d_model=32, hidden_dim=64,
                        max_len=128, use_flash=True)
        kw = dict(num_slots=3, max_ctx=64, max_new_tokens=MAX_NEW,
                  chunk_tokens=4, prefill_chunk=8)
        dense_res = ContinuousBatchingEngine(
            model, params, **kw
        ).generate_all(prompts)
        flash_res = ContinuousBatchingEngine(
            flash, params, **kw
        ).generate_all(prompts)
        for i, (d, f) in enumerate(zip(dense_res, flash_res)):
            assert f["tokens"] == d["tokens"], f"prompt {i}"
            np.testing.assert_allclose(
                f["log_probs"], d["log_probs"], rtol=1e-4, atol=1e-5,
            )


class TestServedUncertainty:
    def test_scores_match_llm_scores_functions(self, model_and_params,
                                               prompts):
        """Per-request perplexity / generation_entropy computed in the
        decode loop must equal the llm.scores functions applied to the
        reference greedy trace."""
        from runia_core_tpu.llm.scores import generation_entropy, perplexity

        model, params = model_and_params
        gen = JaxGenerator(model, params, max_new_tokens=MAX_NEW)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4,
        )
        results = eng.generate_all(prompts[:3])
        for p, res in zip(prompts[:3], results):
            out = gen.generate(p, do_sample=False, output_attentions=False,
                               output_hidden_states=False)
            want_ppl = perplexity(out["log_probs"])
            want_ent = generation_entropy(out["scores"])
            np.testing.assert_allclose(res["perplexity"], want_ppl,
                                       rtol=1e-5)
            np.testing.assert_allclose(res["generation_entropy"], want_ent,
                                       rtol=1e-4)

    def test_in_loop_rauq_matches_offline_rauq(self, model_and_params,
                                               prompts):
        """collect_rauq accumulates each consumed token's previous-position
        attention inside the decode scan; the finished request's RAUQ must
        equal rauq_uncertainty applied to the full HF-shaped attentions of
        the same greedy trace."""
        from runia_core_tpu.llm.scores import rauq_uncertainty

        model, params = model_and_params
        gen = JaxGenerator(model, params, max_new_tokens=MAX_NEW)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, collect_rauq=True,
        )
        results = eng.generate_all(prompts[:3])
        for p, res in zip(prompts[:3], results):
            out = gen.generate(p, do_sample=False, output_attentions=True,
                               output_hidden_states=False)
            want = rauq_uncertainty(out["log_probs"], out["attentions"],
                                    "original")
            np.testing.assert_allclose(res["rauq"], want, rtol=1e-5,
                                       atol=1e-6)

    def test_speculative_rauq_matches_offline_rauq(self, model_and_params,
                                                   prompts):
        """The verify forward's attention rows carry the same RAUQ signal
        as sequential decode (batched queries see identical keys; only f32
        reduction order differs)."""
        from runia_core_tpu.llm.scores import rauq_uncertainty

        model, params = model_and_params
        draft = LlamaLM(vocab_size=VOCAB, num_layers=1, num_heads=2,
                        num_kv_heads=1, d_model=16, hidden_dim=32,
                        max_len=128)
        dparams = draft.init(jax.random.key(3), np.zeros((1, 4), np.int32))
        gen = JaxGenerator(model, params, max_new_tokens=MAX_NEW)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=8, prefill_chunk=8, collect_rauq=True,
            draft_model=draft, draft_params=dparams, gamma=3,
        )
        results = eng.generate_all(prompts[:3])
        for p, res in zip(prompts[:3], results):
            out = gen.generate(p, do_sample=False, output_attentions=True,
                               output_hidden_states=False)
            want = rauq_uncertainty(out["log_probs"], out["attentions"],
                                    "original")
            np.testing.assert_allclose(res["rauq"], want, rtol=1e-4,
                                       atol=1e-5)

    def test_zero_token_result_scores_are_nan(self, model_and_params,
                                              prompts):
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
        )
        rid = eng.submit(prompts[0], max_new_tokens=0)
        eng.run_until_drained()
        res = eng.result(rid)
        assert np.isnan(res["perplexity"])
        assert np.isnan(res["generation_entropy"])


class TestChunkedPrefill:
    """prefill_chunk=C processes prompts in fixed C-token chunks interleaved
    with decode — one compiled prefill shape total — and must stay
    token-identical to the classic whole-prompt path."""

    def test_chunked_matches_single_prompt(self, model_and_params, prompts):
        model, params = model_and_params
        ref = reference_outputs(model, params, prompts, eos_id=None)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=3, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, eos_id=None, prefill_chunk=8,
        )
        results = eng.generate_all(prompts)
        for i, ((ref_toks, ref_lps), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"
            np.testing.assert_allclose(
                res["log_probs"], ref_lps[: len(res["tokens"])],
                rtol=1e-4, atol=1e-5, err_msg=f"prompt {i}",
            )
        # the point of chunking: no per-bucket prefill programs compiled
        assert eng._prefill_cache == {}

    def test_long_prompt_admitted_mid_decode(self, model_and_params):
        """A multi-chunk prompt refilled into a busy engine must decode
        correctly while other slots keep emitting (the interleave case)."""
        model, params = model_and_params
        rng = np.random.RandomState(11)
        short = [list(rng.randint(1, VOCAB, 4)) for _ in range(3)]
        long_p = list(rng.randint(1, VOCAB, 45))  # 6 chunks of 8
        batch = short + [long_p] + short
        ref = reference_outputs(model, params, batch, eos_id=None)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=3, eos_id=None, prefill_chunk=8,
        )
        results = eng.generate_all(batch)
        for i, ((ref_toks, _), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"

    def test_eos_and_budgets_in_chunked_mode(self, model_and_params, prompts):
        model, params = model_and_params
        no_eos = reference_outputs(model, params, prompts, eos_id=None)
        eos_id = no_eos[0][0][min(2, len(no_eos[0][0]) - 1)]
        ref = reference_outputs(model, params, prompts, eos_id=eos_id)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=3, eos_id=eos_id, prefill_chunk=16,
        )
        ids = [eng.submit(p) for p in prompts]
        rid_zero = eng.submit(prompts[0], max_new_tokens=0)
        eng.run_until_drained()
        for rid, (ref_toks, _) in zip(ids, ref):
            assert eng.result(rid)["tokens"] == ref_toks
        assert eng.result(rid_zero)["tokens"] == []

    def test_indivisible_chunk_rejected(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError, match="multiple of"):
            ContinuousBatchingEngine(
                model, params, max_ctx=60, prefill_chunk=16,
            )

    def test_empty_prompt_rejected_at_submit(self, model_and_params):
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, prefill_chunk=8,
        )
        with pytest.raises(ValueError, match="non-empty"):
            eng.submit([])

    def test_nonpositive_chunk_rejected(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError, match="positive"):
            ContinuousBatchingEngine(model, params, prefill_chunk=0)


class TestSpeculativeEngine:
    """Per-slot speculative decoding in the engine: greedy results must be
    token-identical to the plain engine regardless of the draft's
    acceptance rate (acceptance only changes tokens-per-target-forward)."""

    @pytest.fixture(scope="class")
    def draft_and_params(self):
        draft = LlamaLM(vocab_size=VOCAB, num_layers=1, num_heads=2,
                        num_kv_heads=1, d_model=16, hidden_dim=32,
                        max_len=128)
        dparams = draft.init(jax.random.key(9), np.zeros((1, 8), np.int32))
        return draft, dparams

    def _run(self, model, params, draft, dparams, batch, eos_id=None,
             **submit_budgets):
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=10, eos_id=eos_id, prefill_chunk=8,
            draft_model=draft, draft_params=dparams, gamma=3,
        )
        return eng, eng.generate_all(batch)

    def test_uncorrelated_draft_matches_greedy(self, model_and_params,
                                               prompts, draft_and_params):
        model, params = model_and_params
        draft, dparams = draft_and_params
        ref = reference_outputs(model, params, prompts, eos_id=None)
        _, results = self._run(model, params, draft, dparams, prompts)
        for i, ((ref_toks, ref_lps), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"
            np.testing.assert_allclose(
                res["log_probs"], ref_lps[: len(res["tokens"])],
                rtol=1e-4, atol=1e-5, err_msg=f"prompt {i}",
            )

    def test_interactive_acceptance_counters(self, model_and_params,
                                             prompts, draft_and_params):
        """stats() on a speculative engine reports exact accepted/proposed
        draft counters (riding the packed harvest — no extra fetch) plus
        the derived acceptance rate; a perfect draft accepts everything
        and a plain engine carries no such keys."""
        model, params = model_and_params
        draft, dparams = draft_and_params
        eng, _ = self._run(model, params, draft, dparams, prompts)
        st = eng.stats()
        assert st["proposed"] > 0
        assert 0 <= st["accepted"] <= st["proposed"]
        assert st["acceptance"] == round(st["accepted"] / st["proposed"], 4)

        eng2, _ = self._run(model, params, model, params, prompts[:4])
        assert eng2.stats()["acceptance"] > 0.95

        plain = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=10, prefill_chunk=8,
        )
        plain.generate_all(prompts[:2])
        assert "accepted" not in plain.stats()

    def test_perfect_draft_matches_greedy(self, model_and_params, prompts):
        """Draft == target: every proposal accepted, the full-acceptance
        bookkeeping (bonus row, cache coverage) must still be exact."""
        model, params = model_and_params
        ref = reference_outputs(model, params, prompts[:4], eos_id=None)
        _, results = self._run(model, params, model, params, prompts[:4])
        for i, ((ref_toks, _), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"

    def test_eos_budgets_and_prefix_cache(self, model_and_params, prompts,
                                          draft_and_params):
        model, params = model_and_params
        draft, dparams = draft_and_params
        no_eos = reference_outputs(model, params, prompts, eos_id=None)
        eos_id = no_eos[0][0][min(2, len(no_eos[0][0]) - 1)]
        ref = reference_outputs(model, params, prompts, eos_id=eos_id)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=8, eos_id=eos_id, prefill_chunk=8,
            prefix_cache=True, draft_model=draft, draft_params=dparams,
            gamma=3,
        )
        budgets = [3, MAX_NEW, 5, 2, MAX_NEW, 4, 6]
        ids = [eng.submit(p, max_new_tokens=b)
               for p, b in zip(prompts, budgets)]
        eng.run_until_drained()
        for rid, (ref_toks, _), b in zip(ids, ref, budgets):
            assert eng.result(rid)["tokens"] == ref_toks[:b]
            assert eos_id not in eng.result(rid)["tokens"]

    def test_topk_spec_rejected(self, model_and_params, draft_and_params):
        model, params = model_and_params
        draft, dparams = draft_and_params
        with pytest.raises(NotImplementedError, match="temperature"):
            ContinuousBatchingEngine(
                model, params, prefill_chunk=8, do_sample=True, top_k=5,
                draft_model=draft, draft_params=dparams,
            )

    def test_sampled_near_zero_temp_matches_greedy(self, model_and_params,
                                                   prompts, draft_and_params):
        """temperature -> 0 collapses rejection sampling to greedy: every
        draw is the argmax, acceptance is deterministic, and the deferred
        residual is the target's one-hot — outputs must equal the greedy
        reference."""
        model, params = model_and_params
        draft, dparams = draft_and_params
        ref = reference_outputs(model, params, prompts[:4], eos_id=None)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=10, prefill_chunk=8, do_sample=True,
            temperature=1e-4, draft_model=draft, draft_params=dparams,
            gamma=3, key=jax.random.key(11),
        )
        results = eng.generate_all(prompts[:4])
        for i, ((ref_toks, _), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"

    def test_sampled_spec_well_formed(self, model_and_params, prompts,
                                      draft_and_params):
        model, params = model_and_params
        draft, dparams = draft_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=10, prefill_chunk=8, do_sample=True,
            temperature=0.9, draft_model=draft, draft_params=dparams,
            gamma=3, key=jax.random.key(13),
        )
        results = eng.generate_all(prompts[:5])
        for res in results:
            assert len(res["tokens"]) == MAX_NEW
            assert np.isfinite(res["log_probs"]).all()
            assert all(0 <= t < VOCAB for t in res["tokens"])

    def test_spec_requires_chunked_prefill(self, model_and_params,
                                           draft_and_params):
        model, params = model_and_params
        draft, dparams = draft_and_params
        with pytest.raises(ValueError, match="prefill_chunk"):
            ContinuousBatchingEngine(
                model, params, draft_model=draft, draft_params=dparams,
            )


class TestRandomizedConfigSweep:
    def test_random_workloads_stay_token_identical(self, model_and_params):
        """Property sweep: random prompt mixes, budgets, and feature
        combinations (chunked prefill, prefix cache, speculative) must all
        reproduce the single-prompt greedy reference exactly."""
        model, params = model_and_params
        draft = LlamaLM(vocab_size=VOCAB, num_layers=1, num_heads=2,
                        num_kv_heads=1, d_model=16, hidden_dim=32,
                        max_len=128)
        dparams = draft.init(jax.random.key(8), np.zeros((1, 4), np.int32))
        configs = [
            dict(num_slots=3, chunk_tokens=5),
            dict(num_slots=2, chunk_tokens=7, prefill_chunk=4,
                 prefix_cache=True),
            dict(num_slots=2, chunk_tokens=9, prefill_chunk=8,
                 prefix_cache=True, draft_model=draft, draft_params=dparams,
                 gamma=2),
        ]
        # One random workload for every config: the single-prompt reference
        # generates dominate this test's runtime, so computing them once
        # keeps the property coverage (each config still drains the mixed
        # shared-prefix/budget workload) at a third of the wall.
        rng = np.random.RandomState(100)
        shared = list(rng.randint(1, VOCAB, 9))
        batch = []
        for _ in range(6):
            if rng.rand() < 0.4:
                batch.append(shared + list(
                    rng.randint(1, VOCAB, rng.randint(1, 8))))
            else:
                batch.append(list(
                    rng.randint(1, VOCAB, rng.randint(2, 24))))
        budgets = rng.randint(1, MAX_NEW + 1, len(batch))
        ref = reference_outputs(model, params, batch, eos_id=None)
        for seed, cfg in enumerate(configs):
            eng = ContinuousBatchingEngine(
                model, params, max_ctx=64, max_new_tokens=MAX_NEW, **cfg,
            )
            ids = [eng.submit(p, max_new_tokens=int(b))
                   for p, b in zip(batch, budgets)]
            eng.run_until_drained()
            for rid, (ref_toks, _), b in zip(ids, ref, budgets):
                assert eng.result(rid)["tokens"] == ref_toks[:b], (seed, rid)


class TestSlidingWindowServing:
    def test_windowed_model_serves_token_identically(self):
        """Mistral-style uniform sliding windows ride the per-slot physical
        clocks (distance == logical offset in both engine layouts)."""
        model = LlamaLM(vocab_size=VOCAB, num_layers=2, num_heads=4,
                        num_kv_heads=2, d_model=32, hidden_dim=64,
                        max_len=128, sliding_window=6)
        params = model.init(jax.random.key(5), np.zeros((1, 8), np.int32))
        rng = np.random.RandomState(13)
        batch = [list(rng.randint(1, VOCAB, rng.randint(3, 20)))
                 for _ in range(4)]
        ref = reference_outputs(model, params, batch, eos_id=None)
        for extra in ({}, {"prefill_chunk": 8, "prefix_cache": True}):
            eng = ContinuousBatchingEngine(
                model, params, num_slots=2, max_ctx=64,
                max_new_tokens=MAX_NEW, chunk_tokens=4, **extra,
            )
            results = eng.generate_all(batch)
            for i, ((ref_toks, _), res) in enumerate(zip(ref, results)):
                assert res["tokens"] == ref_toks, (extra, i)


class TestStreaming:
    def test_stream_increments_equal_final_results(self, model_and_params,
                                                   prompts):
        model, params = model_and_params
        eos_ref = reference_outputs(model, params, prompts, eos_id=None)
        eos_id = eos_ref[0][0][min(2, len(eos_ref[0][0]) - 1)]
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=3, eos_id=eos_id,
        )
        ids = [eng.submit(p) for p in prompts]
        streamed: dict = {rid: [] for rid in ids}
        n_yields: dict = {rid: 0 for rid in ids}
        for rid, new in eng.stream():
            streamed[rid].extend(new)
            n_yields[rid] += 1
        for rid in ids:
            assert streamed[rid] == eng.result(rid)["tokens"], rid
        # at least one request streams over multiple chunks
        assert any(n > 1 for n in n_yields.values()), n_yields


class TestTensorParallelServing:
    def test_engine_on_tp_sharded_params(self, model_and_params, prompts):
        """The engine over Megatron-TP-sharded params (8-device model mesh)
        must produce the same tokens — the cache inherits the head sharding
        through the k/v projection outputs."""
        from jax.sharding import Mesh
        from runia_core_tpu.parallel import shard_llama_params

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        model, params = model_and_params
        ref = reference_outputs(model, params, prompts[:4], eos_id=None)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
        sharded = shard_llama_params(params, mesh)
        eng = ContinuousBatchingEngine(
            model, sharded, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, prefill_chunk=8,
        )
        results = eng.generate_all(prompts[:4])
        for i, ((ref_toks, _), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"


class TestMoEServing:
    def test_mixtral_style_model_serves_token_identically(self):
        """The MoE FFN (LlamaLM num_experts>0) must flow through slot
        prefill, chunked prefill, and vector-cache_index decode unchanged."""
        model = LlamaLM(vocab_size=VOCAB, num_layers=2, num_heads=4,
                        num_kv_heads=2, d_model=32, hidden_dim=64,
                        max_len=128, num_experts=4)
        params = model.init(jax.random.key(4), np.zeros((1, 8), np.int32))
        rng = np.random.RandomState(9)
        batch = [list(rng.randint(1, VOCAB, rng.randint(3, 20)))
                 for _ in range(4)]
        ref = reference_outputs(model, params, batch, eos_id=None)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, prefill_chunk=8, prefix_cache=True,
        )
        results = eng.generate_all(batch)
        for i, ((ref_toks, _), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"


class TestPrefixCache:
    """Automatic prefix caching: admissions sharing a chunk-aligned prompt
    prefix with a resident slot copy that slot's KV row and prefill only
    the suffix — results must stay token-identical."""

    def test_shared_system_prompt_matches_and_hits(self, model_and_params):
        model, params = model_and_params
        rng = np.random.RandomState(21)
        system = list(rng.randint(1, VOCAB, 18))  # two full chunks of 8
        batch = [system + list(rng.randint(1, VOCAB, rng.randint(2, 9)))
                 for _ in range(6)]
        ref = reference_outputs(model, params, batch, eos_id=None)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=3, prefill_chunk=8, prefix_cache=True,
        )
        results = eng.generate_all(batch)
        for i, ((ref_toks, ref_lps), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"
            np.testing.assert_allclose(
                res["log_probs"], ref_lps[: len(res["tokens"])],
                rtol=1e-4, atol=1e-5, err_msg=f"prompt {i}",
            )
        # every admission after the first two (cold slots) shares >= 2
        # chunks with a resident prompt
        assert eng.prefix_hits >= 3, eng.prefix_hits

    def test_identical_prompt_reuses_resident_row(self, model_and_params):
        """A duplicate prompt re-prefills only its final chunk (the
        next-token logits must come from a real suffix pass)."""
        model, params = model_and_params
        rng = np.random.RandomState(22)
        prompt = list(rng.randint(1, VOCAB, 20))
        ref = reference_outputs(model, params, [prompt, prompt], eos_id=None)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=1, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, prefill_chunk=8, prefix_cache=True,
        )
        results = eng.generate_all([prompt, prompt])
        for (ref_toks, _), res in zip(ref, results):
            assert res["tokens"] == ref_toks
        assert eng.prefix_hits == 1  # second admission hit its own slot

    def test_first_wave_duplicates_wait_for_their_donor(self,
                                                        model_and_params):
        """N duplicates submitted together: the scheduler defers the
        copies until the first admission's prefill advances, so every
        duplicate hits the cache instead of prefilling from scratch."""
        model, params = model_and_params
        rng = np.random.RandomState(31)
        prompt = list(rng.randint(1, VOCAB, 26))
        ref = reference_outputs(model, params, [prompt], eos_id=None)[0][0]
        eng = ContinuousBatchingEngine(
            model, params, num_slots=4, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, prefill_chunk=8, prefix_cache=True,
        )
        results = eng.generate_all([prompt] * 4)
        assert eng.prefix_hits == 3, eng.prefix_hits
        for res in results:
            assert res["tokens"] == ref

    def test_disjoint_prompts_never_hit(self, model_and_params, prompts):
        model, params = model_and_params
        rng = np.random.RandomState(23)
        batch = [list(rng.randint(1, VOCAB, 12) + i % 2) for i in range(4)]
        # force first tokens distinct so no chunk-aligned prefix matches
        for i, b in enumerate(batch):
            b[0] = 1 + i
        ref = reference_outputs(model, params, batch, eos_id=None)
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            prefill_chunk=8, prefix_cache=True,
        )
        results = eng.generate_all(batch)
        for (ref_toks, _), res in zip(ref, results):
            assert res["tokens"] == ref_toks
        assert eng.prefix_hits == 0

    def test_requires_chunked_prefill(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError, match="prefill_chunk"):
            ContinuousBatchingEngine(model, params, prefix_cache=True)


class TestVectorCacheIndex:
    def test_vector_index_equals_scalar_when_uniform(self, model_and_params):
        """A (B,) cache_index with equal entries must reproduce the scalar
        path bit-for-bit (the continuous engine's degenerate case)."""
        from runia_core_tpu.models.transformer import init_cache

        model, params = model_and_params
        b, p = 3, 8
        rng = np.random.RandomState(0)
        prompt = jnp.asarray(rng.randint(1, VOCAB, (b, p)), jnp.int32)
        cache = init_cache(model, b, 32)
        logits, _, _, cache = model.apply(params, prompt, cache, jnp.int32(0))
        tok = jnp.argmax(logits[:, -1, :], axis=-1)[:, None]

        s_logits, _, _, _ = model.apply(params, tok, cache, jnp.int32(p))
        v_logits, _, _, _ = model.apply(
            params, tok, cache, jnp.full((b,), p, jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(v_logits), np.asarray(s_logits), rtol=1e-6, atol=1e-6
        )


class TestPerRequestBudget:
    def test_per_request_max_new(self, model_and_params, prompts):
        """Each request stops at ITS budget; slots free early and refill."""
        model, params = model_and_params
        budgets = [3, 7, 5, 2, 9, 4, 6]
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, eos_id=None,
        )
        ids = [eng.submit(p, max_new_tokens=b)
               for p, b in zip(prompts, budgets)]
        eng.run_until_drained()
        ref = reference_outputs(model, params, prompts, eos_id=None)
        for rid, (ref_toks, _), budget in zip(ids, ref, budgets):
            res = eng.result(rid)
            assert res["tokens"] == ref_toks[:budget]

    def test_stats_counters(self, model_and_params, prompts):
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, prefill_chunk=8, prefix_cache=True,
        )
        eng.generate_all([prompts[0], prompts[0], prompts[1]])
        st = eng.stats()
        assert st["requests_finished"] == 3
        assert st["tokens_emitted"] == 3 * MAX_NEW
        assert st["decode_chunks"] > 0 and st["prefill_chunks"] > 0
        assert st["prefix_hits"] == (1 if len(prompts[0]) > 8 else 0)
        # the wall-time breakdown is actually measured, not declared
        assert st["t_fetch_s"] > 0 and st["t_sched_s"] > 0

    def test_generate_all_validates_before_enqueuing(
        self, model_and_params, prompts
    ):
        """A bad prompt mid-batch must not leave its predecessors queued:
        a persistent server's next drain would decode them as ghost work."""
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=32, max_new_tokens=MAX_NEW,
            chunk_tokens=4, prefill_chunk=8,
        )
        too_long = list(range(1, 64))
        with pytest.raises(ValueError, match="exceeds"):
            eng.generate_all([prompts[0], too_long])
        assert not eng._queue and eng.stats()["tokens_emitted"] == 0
        # the engine stays fully usable afterwards
        res = eng.generate_all([prompts[0]])
        assert len(res[0]["tokens"]) == MAX_NEW

    def test_zero_budget_returns_empty(self, model_and_params, prompts):
        """max_new_tokens=0 means zero tokens — not the engine default
        (regression: the falsy-or in submit once swapped 0 for the default)."""
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, eos_id=None,
        )
        rid_zero = eng.submit(prompts[0], max_new_tokens=0)
        rid_two = eng.submit(prompts[1], max_new_tokens=2)
        eng.run_until_drained()
        assert eng.result(rid_zero)["tokens"] == []
        assert len(eng.result(rid_two)["tokens"]) == 2


class TestBatchedAdmissionWave:
    """Admission waves of >= _BATCH_F same-bucket prompts ride ONE batched
    prefill program (classic mode); results must stay token-identical to
    the per-prompt decoder."""

    def test_wave_admission_matches_single_prompt(self, model_and_params):
        model, params = model_and_params
        rng = np.random.RandomState(11)
        # 10 prompts, all inside one prompt_bucket=16 bucket: the first
        # refill admits 8 of them through the batched program and the
        # remaining 2 through the F=1 shape.
        wave = [list(rng.randint(1, VOCAB, rng.randint(9, 16)))
                for _ in range(10)]
        ref = reference_outputs(model, params, wave, eos_id=None)

        eng = ContinuousBatchingEngine(
            model, params, num_slots=10, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, eos_id=None, prompt_bucket=16,
        )
        results = eng.generate_all(wave)
        for i, ((ref_toks, ref_lps), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"
            np.testing.assert_allclose(
                res["log_probs"], ref_lps[: len(res["tokens"])],
                rtol=1e-4, atol=1e-5, err_msg=f"prompt {i}",
            )

    def test_mixed_bucket_wave(self, model_and_params):
        """A wave spanning two buckets groups per-bucket and still matches."""
        model, params = model_and_params
        rng = np.random.RandomState(12)
        short = [list(rng.randint(1, VOCAB, rng.randint(3, 8)))
                 for _ in range(3)]
        long = [list(rng.randint(1, VOCAB, rng.randint(9, 16)))
                for _ in range(3)]
        wave = short + long
        ref = reference_outputs(model, params, wave, eos_id=None)

        eng = ContinuousBatchingEngine(
            model, params, num_slots=6, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, eos_id=None, prompt_bucket=8,
        )
        results = eng.generate_all(wave)
        for i, ((ref_toks, _), res) in enumerate(zip(ref, results)):
            assert res["tokens"] == ref_toks, f"prompt {i}"


class TestDeferredFetch:
    """Open-loop drain (defer_fetch=True): no mid-drain harvest fetches —
    the host simulates the (deterministic, EOS-free) emission schedule and
    parses every harvest at drain end. Results must be identical to the
    fetch-based drain in every mode that supports it."""

    def _both(self, model, params, prompts, budgets=None, **kw):
        base = ContinuousBatchingEngine(model, params, **kw)
        open_loop = ContinuousBatchingEngine(model, params,
                                             defer_fetch=True, **kw)
        if budgets is None:
            return (base.generate_all(prompts),
                    open_loop.generate_all(prompts))
        outs = []
        for eng in (base, open_loop):
            ids = [eng.submit(p, b) for p, b in zip(prompts, budgets)]
            eng.run_until_drained()
            outs.append([eng.result(i) for i in ids])
        return outs

    def test_matches_fetch_drain_classic_mode(self, model_and_params,
                                              prompts):
        model, params = model_and_params
        ref, res = self._both(
            model, params, prompts, num_slots=3, max_ctx=64,
            max_new_tokens=MAX_NEW, chunk_tokens=4,
        )
        for i, (r, o) in enumerate(zip(ref, res)):
            assert o["tokens"] == r["tokens"], f"prompt {i}"
            np.testing.assert_allclose(o["log_probs"], r["log_probs"])

    def test_matches_fetch_drain_chunked_prefix_budgets(
        self, model_and_params, prompts
    ):
        """Chunked prefill + prefix cache + heterogeneous budgets: refills
        and prefix copies interleave with simulated chunks."""
        model, params = model_and_params
        budgets = [1, 9, 2, 7, 3, 10, 4]
        ref, res = self._both(
            model, params, prompts, budgets, num_slots=2, max_ctx=64,
            max_new_tokens=MAX_NEW, chunk_tokens=5, prefill_chunk=8,
            prefix_cache=True,
        )
        for i, (r, o) in enumerate(zip(ref, res)):
            assert o["tokens"] == r["tokens"], f"request {i}"
            assert len(o["tokens"]) == min(budgets[i], MAX_NEW + budgets[i])

    def test_rauq_and_scores_match(self, model_and_params, prompts):
        model, params = model_and_params
        kw = dict(num_slots=3, max_ctx=64, max_new_tokens=MAX_NEW,
                  chunk_tokens=4, collect_rauq=True)
        ref, res = self._both(model, params, prompts[:4], **kw)
        for r, o in zip(ref, res):
            np.testing.assert_allclose(o["rauq"], r["rauq"], rtol=1e-6)
            np.testing.assert_allclose(o["perplexity"], r["perplexity"])

    def test_hidden_collection_matches(self, model_and_params, prompts):
        model, params = model_and_params
        kw = dict(num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
                  chunk_tokens=4, collect_hidden=-1)
        ref, res = self._both(model, params, prompts[:5], **kw)
        for r, o in zip(ref, res):
            np.testing.assert_allclose(o["hidden"], r["hidden"])

    def test_sampled_mode_well_formed(self, model_and_params, prompts):
        """Sampled decode: token VALUES differ from any reference (fresh
        RNG threading) but lengths are budget-exact and scores finite."""
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=3, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, do_sample=True, temperature=0.9,
            defer_fetch=True, key=jax.random.key(11),
        )
        for res in eng.generate_all(prompts[:5]):
            assert len(res["tokens"]) == MAX_NEW
            assert np.isfinite(res["log_probs"]).all()

    def test_stream_burst_equals_results(self, model_and_params, prompts):
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, defer_fetch=True,
        )
        ids = [eng.submit(p) for p in prompts]
        got = {}
        for rid, toks in eng.stream():
            got.setdefault(rid, []).extend(toks)
        for rid in ids:
            assert got[rid] == eng.result(rid)["tokens"]

    def test_requires_no_eos_and_no_draft(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError, match="eos_id"):
            ContinuousBatchingEngine(model, params, eos_id=3,
                                     defer_fetch=True)

    def test_zero_fetches_mid_drain(self, model_and_params, prompts,
                                    monkeypatch):
        """The open-loop drain must not fetch a single harvest until the
        flush: every np.asarray on a packed buffer happens after the last
        dispatch."""
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=4, defer_fetch=True,
        )
        order = []
        orig_dispatch = eng._dispatch_chunk
        orig_flush = eng._flush_deferred

        def spy_dispatch(*a, **k):
            order.append("dispatch")
            return orig_dispatch(*a, **k)

        def spy_flush(pending):
            order.append("flush")
            return orig_flush(pending)

        monkeypatch.setattr(eng, "_dispatch_chunk", spy_dispatch)
        monkeypatch.setattr(eng, "_flush_deferred", spy_flush)
        eng.generate_all(prompts)
        assert order.index("flush") == len(order) - 1
        assert order.count("dispatch") >= 2


class TestLookaheadPipeline:
    """The drain loop dispatches chunk k+1 from the device-resident
    scheduling state before chunk k's harvest is processed. These tests pin
    the two hazards that pipelining introduces: a slot that finishes inside
    an in-flight chunk and is refilled before that chunk's harvest lands
    (ownership), and the tail guard that skips the final lookahead chunk."""

    def test_staggered_budgets_force_refill_under_inflight_chunk(
        self, model_and_params
    ):
        """Per-request budgets 1..12 over 2 slots with chunk 5: slots free
        mid-drain constantly, so refills race in-flight chunks every few
        chunks. Every request must still match its single-prompt trace."""
        model, params = model_and_params
        rng = np.random.RandomState(21)
        prompts = [list(rng.randint(1, VOCAB, rng.randint(3, 20)))
                   for _ in range(9)]
        budgets = [1, 12, 2, 7, 3, 1, 9, 4, 2]

        gen = JaxGenerator(model, params, max_new_tokens=12, eos_id=None)
        want = []
        for p, b in zip(prompts, budgets):
            out = gen.generate(p, do_sample=False, output_attentions=False,
                               output_hidden_states=False)
            want.append(np.asarray(out["sequences"][0, len(p):len(p) + b])
                        .tolist())

        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=12,
            chunk_tokens=5, eos_id=None,
        )
        ids = [eng.submit(p, b) for p, b in zip(prompts, budgets)]
        eng.run_until_drained()
        for i, rid in enumerate(ids):
            assert eng.result(rid)["tokens"] == want[i], f"request {i}"

    def test_stream_increments_equal_final_tokens_under_refill(
        self, model_and_params, prompts
    ):
        """stream() increments concatenated per request must equal the
        final result even when yields interleave with lookahead refills."""
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=3, eos_id=None,
        )
        ids = [eng.submit(p) for p in prompts]
        seen = {rid: [] for rid in ids}
        for rid, new in eng.stream():
            seen[rid].extend(new)
        for rid in ids:
            assert seen[rid] == eng.result(rid)["tokens"]

    def test_tail_drain_single_small_request(self, model_and_params):
        """A lone request whose whole budget fits in one chunk exercises
        the tail guard's skip path (no lookahead chunk after the last)."""
        model, params = model_and_params
        prompt = list(np.random.RandomState(5).randint(1, VOCAB, 6))
        gen = JaxGenerator(model, params, max_new_tokens=4, eos_id=None)
        out = gen.generate(prompt, do_sample=False, output_attentions=False,
                           output_hidden_states=False)
        want = np.asarray(out["sequences"][0, len(prompt):]).tolist()

        eng = ContinuousBatchingEngine(
            model, params, num_slots=3, max_ctx=64, max_new_tokens=4,
            chunk_tokens=8, eos_id=None,
        )
        rid = eng.submit(prompt)
        eng.run_until_drained()
        assert eng.result(rid)["tokens"] == want
        # The drained engine must be reusable (slot state fully reset).
        rid2 = eng.submit(prompt)
        eng.run_until_drained()
        assert eng.result(rid2)["tokens"] == want


class TestFusedDrain:
    """generate_all_fused: the on-device scheduler (one while_loop, zero
    per-chunk host round trips) must reproduce the interactive drain."""

    def _engine(self, model, params, **kw):
        cfg = dict(num_slots=4, max_ctx=64, max_new_tokens=MAX_NEW,
                   chunk_tokens=3, prefill_chunk=8, eos_id=None)
        cfg.update(kw)
        return ContinuousBatchingEngine(model, params, **cfg)

    def test_greedy_token_identical_to_generator(self, model_and_params,
                                                 prompts):
        model, params = model_and_params
        want = reference_outputs(model, params, prompts, None)
        res = self._engine(model, params).generate_all_fused(prompts)
        for r, (toks, lps) in zip(res, want):
            assert r["tokens"] == toks
            np.testing.assert_allclose(r["log_probs"], lps, rtol=2e-4,
                                       atol=2e-5)

    def test_matches_interactive_drain_results(self, model_and_params,
                                               prompts):
        """Same engine config, fused vs interactive: identical tokens and
        uncertainty scores (shared step program, shared prefill layout)."""
        model, params = model_and_params
        a = self._engine(model, params).generate_all(prompts)
        b = self._engine(model, params).generate_all_fused(prompts)
        for ra, rb in zip(a, b):
            assert ra["tokens"] == rb["tokens"]
            np.testing.assert_allclose(
                rb["log_probs"], ra["log_probs"], rtol=2e-4, atol=2e-5)
            np.testing.assert_allclose(
                rb["perplexity"], ra["perplexity"], rtol=2e-4)
            np.testing.assert_allclose(
                rb["generation_entropy"], ra["generation_entropy"],
                rtol=2e-4)

    def test_eos_stops_and_strips(self, model_and_params, prompts):
        model, params = model_and_params
        eos = 7
        a = self._engine(model, params, eos_id=eos).generate_all(prompts)
        b = self._engine(model, params,
                         eos_id=eos).generate_all_fused(prompts)
        for ra, rb in zip(a, b):
            assert ra["tokens"] == rb["tokens"]
            assert eos not in rb["tokens"]

    def test_per_request_budgets(self, model_and_params, prompts):
        model, params = model_and_params
        budgets = [1 + (i % 4) for i in range(len(prompts))]
        want = reference_outputs(model, params, prompts, None)
        res = self._engine(model, params).generate_all_fused(
            prompts, max_new_tokens=budgets)
        for r, (toks, _), b in zip(res, want, budgets):
            assert r["tokens"] == toks[:b]

    def test_more_requests_than_slots_refills(self, model_and_params):
        model, params = model_and_params
        rng = np.random.RandomState(11)
        many = [list(rng.randint(1, VOCAB, rng.randint(3, 30)))
                for _ in range(13)]
        want = reference_outputs(model, params, many, None)
        res = self._engine(model, params,
                           num_slots=3).generate_all_fused(many)
        for r, (toks, _) in zip(res, want):
            assert r["tokens"] == toks

    def test_sampled_mode_well_formed(self, model_and_params, prompts):
        model, params = model_and_params
        eng = self._engine(model, params, do_sample=True, temperature=0.9)
        res = eng.generate_all_fused(prompts[:3])
        for r in res:
            assert len(r["tokens"]) == MAX_NEW
            assert np.isfinite(r["log_probs"]).all()

    def test_rejects_unsupported_modes(self, model_and_params, prompts):
        model, params = model_and_params
        with pytest.raises(ValueError, match="prefill_chunk"):
            ContinuousBatchingEngine(
                model, params, num_slots=2, max_ctx=64,
            ).generate_all_fused(prompts[:1])
        with pytest.raises(ValueError, match="plain decode"):
            self._engine(model, params,
                         collect_rauq=True).generate_all_fused(prompts[:1])
        with pytest.raises(RuntimeError, match="in-flight"):
            eng = self._engine(model, params)
            eng.submit(prompts[0])
            eng.generate_all_fused(prompts[:1])
        with pytest.raises(ValueError, match="exceeds"):
            self._engine(model, params).generate_all_fused(
                [list(range(1, 60))], max_new_tokens=[30])

    def test_spec_greedy_token_identical(self, model_and_params, prompts):
        """Fused speculative drain (uncorrelated 1L draft): greedy output
        must equal the plain generator exactly — acceptance only changes
        tokens-per-verify-forward, never the stream."""
        model, params = model_and_params
        draft = LlamaLM(vocab_size=VOCAB, num_layers=1, num_heads=2,
                        num_kv_heads=1, d_model=16, hidden_dim=32,
                        max_len=128)
        dparams = draft.init(jax.random.key(9), np.zeros((1, 8), np.int32))
        ref = reference_outputs(model, params, prompts, eos_id=None)
        eng = self._engine(model, params, draft_model=draft,
                           draft_params=dparams, gamma=3, chunk_tokens=8)
        res = eng.generate_all_fused(prompts)
        for i, ((ref_toks, ref_lps), r) in enumerate(zip(ref, res)):
            assert r["tokens"] == ref_toks, f"prompt {i}"
            np.testing.assert_allclose(
                r["log_probs"], ref_lps[: len(r["tokens"])],
                rtol=1e-4, atol=1e-5, err_msg=f"prompt {i}",
            )
        stats = eng._last_fused_stats
        assert stats["proposed"] > 0
        assert 0.0 <= stats["acceptance"] <= 1.0

    def test_spec_perfect_draft_and_interactive_parity(self,
                                                       model_and_params,
                                                       prompts):
        """Draft == target (full acceptance: bonus-row bookkeeping) AND
        fused == interactive spec engine on tokens + uncertainty."""
        model, params = model_and_params
        kw = dict(draft_model=model, draft_params=params, gamma=3,
                  chunk_tokens=8)
        a = self._engine(model, params, **kw).generate_all(prompts[:4])
        eng = self._engine(model, params, **kw)
        b = eng.generate_all_fused(prompts[:4])
        assert eng._last_fused_stats["acceptance"] > 0.95
        for ra, rb in zip(a, b):
            assert ra["tokens"] == rb["tokens"]
            np.testing.assert_allclose(rb["log_probs"], ra["log_probs"],
                                       rtol=2e-4, atol=2e-5)
            np.testing.assert_allclose(rb["generation_entropy"],
                                       ra["generation_entropy"], rtol=2e-4)

    def test_spec_eos_budgets_and_refill(self, model_and_params, prompts):
        model, params = model_and_params
        no_eos = reference_outputs(model, params, prompts, eos_id=None)
        eos_id = no_eos[0][0][min(2, len(no_eos[0][0]) - 1)]
        ref = reference_outputs(model, params, prompts, eos_id=eos_id)
        draft = LlamaLM(vocab_size=VOCAB, num_layers=1, num_heads=2,
                        num_kv_heads=1, d_model=16, hidden_dim=32,
                        max_len=128)
        dparams = draft.init(jax.random.key(9), np.zeros((1, 8), np.int32))
        budgets = [3, MAX_NEW, 5, 2, MAX_NEW, 4, 6]
        res = self._engine(
            model, params, num_slots=2, eos_id=eos_id, draft_model=draft,
            draft_params=dparams, gamma=3, chunk_tokens=8,
        ).generate_all_fused(prompts, max_new_tokens=budgets)
        for r, (ref_toks, _), b in zip(res, ref, budgets):
            assert r["tokens"] == ref_toks[:b]
            assert eos_id not in r["tokens"]

    def test_spec_sampled_collapses_to_greedy_at_low_temperature(
        self, model_and_params, prompts
    ):
        """Exactness smoke for the fused Leviathan path: at T->0 every
        rejection-sampled token is the greedy token."""
        model, params = model_and_params
        draft = LlamaLM(vocab_size=VOCAB, num_layers=1, num_heads=2,
                        num_kv_heads=1, d_model=16, hidden_dim=32,
                        max_len=128)
        dparams = draft.init(jax.random.key(9), np.zeros((1, 8), np.int32))
        ref = reference_outputs(model, params, prompts[:4], eos_id=None)
        res = self._engine(
            model, params, draft_model=draft, draft_params=dparams,
            gamma=3, chunk_tokens=8, do_sample=True, temperature=1e-4,
        ).generate_all_fused(prompts[:4])
        for r, (ref_toks, _) in zip(res, ref):
            assert r["tokens"] == ref_toks

    def test_prefill_lanes_one_matches_default(self, model_and_params,
                                               prompts):
        """prefill_lanes=1 is the bit-identity mode (batch-1 chunk prefill
        like the interactive drain); in f32 both lane widths must agree
        exactly — this pins the lane plumbing, not bf16 rounding."""
        model, params = model_and_params
        a = self._engine(model, params).generate_all_fused(
            prompts, prefill_lanes=1)
        b = self._engine(model, params).generate_all_fused(prompts)
        for ra, rb in zip(a, b):
            assert ra["tokens"] == rb["tokens"]

    def test_empty_and_engine_reuse(self, model_and_params, prompts):
        model, params = model_and_params
        eng = self._engine(model, params)
        assert eng.generate_all_fused([]) == []
        a = eng.generate_all_fused(prompts[:2])
        b = eng.generate_all_fused(prompts[:2])  # cache rows fully rewritten
        for ra, rb in zip(a, b):
            assert ra["tokens"] == rb["tokens"]

    def test_fused_invalidates_prefix_cache_residency(self, model_and_params):
        """Interactive drain -> fused drain -> interactive submit sharing a
        chunk-aligned prefix with the FIRST drain's prompt: the fused run
        rewrote those cache rows, so a stale residency entry would splice
        unrelated KV into the new request. Tokens must match a fresh
        engine's (regression for the _slot_prompt reset)."""
        model, params = model_and_params
        rng = np.random.RandomState(11)
        base = list(rng.randint(1, VOCAB, 16))  # two full chunks of 8
        prompt_a = base + list(rng.randint(1, VOCAB, 3))
        prompt_b = base + list(rng.randint(1, VOCAB, 5))
        other = [list(rng.randint(1, VOCAB, 12)) for _ in range(4)]

        eng = self._engine(model, params, prefix_cache=True)
        eng.generate_all([prompt_a])          # marks prompt_a resident
        eng.generate_all_fused(other)         # rewrites those cache rows
        got = eng.generate_all([prompt_b])    # must NOT reuse stale rows

        want = self._engine(model, params).generate_all([prompt_b])
        assert got[0]["tokens"] == want[0]["tokens"]
        np.testing.assert_allclose(
            got[0]["log_probs"], want[0]["log_probs"], rtol=2e-4, atol=2e-5)

    def test_fused_updates_engine_counters(self, model_and_params, prompts):
        """stats() must account fused traffic like interactive traffic:
        device-emitted tokens (incl. EOS) and chunk counters."""
        model, params = model_and_params
        eng = self._engine(model, params, eos_id=7)
        s0 = eng.stats()
        res = eng.generate_all_fused(prompts[:3])
        s1 = eng.stats()
        emitted = s1["tokens_emitted"] - s0["tokens_emitted"]
        stripped = sum(len(r["tokens"]) for r in res)
        assert emitted >= stripped  # EOS tokens counted, strip is host-side
        assert s1["prefill_chunks"] > s0["prefill_chunks"]
        assert s1["decode_chunks"] > s0["decode_chunks"]
        assert s1["requests_finished"] - s0["requests_finished"] == 3


class TestSpeculativeBreakeven:
    """The measured break-even guard: a draft whose acceptance sits below
    speculative_breakeven's floor must auto-fall-back to the plain path —
    with token-identical greedy results before AND after the switch."""

    def test_breakeven_model(self):
        from runia_core_tpu.llm.continuous import speculative_breakeven

        # Full-depth int8 self-draft (round-3 regression): the ideal floor
        # is 0.856 — the measured 0.866 acceptance had ~1% headroom, which
        # per-round overhead consumed. With the measured fixed cost in the
        # model, no acceptance pays.
        assert speculative_breakeven(0.55, 4) > 0.85
        assert speculative_breakeven(0.55, 4, overhead=1.5) == 1.0
        # Distillation-grade draft: the floor is where expected emitted
        # tokens E(a) = (1-a^(g+1))/(1-a) equals the round cost.
        for c, g in [(0.2, 4), (0.1, 6), (0.3, 2)]:
            a = speculative_breakeven(c, g)
            assert 0.0 < a < 1.0
            cost = (g + 1) * c + 1.0
            np.testing.assert_allclose(
                (1 - a ** (g + 1)) / (1 - a), cost, rtol=1e-6
            )
        # Cheaper drafts break even at lower acceptance; overhead raises
        # the floor.
        assert speculative_breakeven(0.1, 4) < speculative_breakeven(0.3, 4)
        assert (speculative_breakeven(0.2, 4, overhead=0.5)
                > speculative_breakeven(0.2, 4))

    def test_auto_disable_falls_back_token_identically(
        self, model_and_params, prompts
    ):
        model, params = model_and_params
        draft = LlamaLM(vocab_size=VOCAB, num_layers=1, num_heads=2,
                        num_kv_heads=1, d_model=16, hidden_dim=32,
                        max_len=128)
        dparams = draft.init(jax.random.key(9), np.zeros((1, 8), np.int32))
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=10, prefill_chunk=8,
            draft_model=draft, draft_params=dparams, gamma=3,
            spec_min_acceptance=1.0,  # uncorrelated draft: always below
        )
        eng._SPEC_EVIDENCE = 1
        ref = reference_outputs(model, params, prompts, eos_id=None)
        # Drain 1: speculative (no evidence yet at entry), gathers counters.
        res_a = eng.generate_all(prompts)
        assert not eng._spec_disabled
        # Drain 2: guard fires at entry; runs on the plain chunk path.
        with pytest.warns(UserWarning, match="break-even"):
            res_b = eng.generate_all(prompts)
        assert eng._spec_disabled
        assert eng.stats()["spec_disabled"] == 1
        for (ref_toks, _), ra, rb in zip(ref, res_a, res_b):
            assert ra["tokens"] == ref_toks
            assert rb["tokens"] == ref_toks

    def test_healthy_draft_stays_enabled(self, model_and_params, prompts):
        """A self-draft (acceptance 1.0) with any finite floor never
        trips the guard."""
        model, params = model_and_params
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=MAX_NEW,
            chunk_tokens=10, prefill_chunk=8,
            draft_model=model, draft_params=params, gamma=3,
            spec_min_acceptance=0.9,
        )
        eng._SPEC_EVIDENCE = 1
        eng.generate_all(prompts)
        eng.generate_all(prompts)
        assert not eng._spec_disabled
        assert eng.stats()["acceptance"] == 1.0


class TestLPTAdmission:
    """Longest-budget-first admission: same per-request results as FIFO
    (greedy decoding is order-independent per slot), fewer decode chunks
    on a straggler-shaped workload."""

    def _drain(self, model, params, prompts, budgets, admission):
        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=16,
            chunk_tokens=4, admission=admission,
        )
        rids = [eng.submit(p, b) for p, b in zip(prompts, budgets)]
        eng.run_until_drained()
        return eng, [eng.result(r) for r in rids]

    def test_results_match_fifo_and_chunks_shrink(self, model_and_params):
        model, params = model_and_params
        rng = np.random.RandomState(11)
        # Straggler shape: one long request submitted LAST — FIFO decodes
        # it alone at the tail while the other slot idles.
        prompts = [list(rng.randint(1, VOCAB, 6)) for _ in range(5)]
        budgets = [2, 2, 2, 2, 16]
        eng_f, res_f = self._drain(model, params, prompts, budgets, "fifo")
        eng_l, res_l = self._drain(model, params, prompts, budgets, "lpt")
        for a, b in zip(res_f, res_l):
            assert a["tokens"] == b["tokens"]
            np.testing.assert_allclose(a["log_probs"], b["log_probs"],
                                       rtol=1e-5, atol=1e-6)
        assert (eng_l.stats()["decode_chunks"]
                < eng_f.stats()["decode_chunks"])

    def test_bad_policy_rejected(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError, match="admission"):
            ContinuousBatchingEngine(model, params, admission="sjf")
