"""Batch uncertainty serving (engine-backed compute_uncertainties).

Deterministic scores must equal the single-prompt compute_uncertainties
path on the same greedy traces; sampled scores are pinned through the
near-zero-temperature collapse (all samples greedy => normalized entropy
equals the deterministic per-token NLL, semantic entropy is one cluster).
"""

import numpy as np
import pytest

import jax

from runia_core_tpu.llm import (
    JaxGenerator,
    UncertaintyServer,
    serve_uncertainties,
)
from runia_core_tpu.llm.scores import compute_uncertainties
from runia_core_tpu.models import LlamaLM

VOCAB, MAX_NEW = 64, 8


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaLM(vocab_size=VOCAB, num_layers=2, num_heads=4,
                    num_kv_heads=2, d_model=32, hidden_dim=64, max_len=128)
    params = model.init(jax.random.key(0), np.zeros((1, 8), np.int32))
    return model, params


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.RandomState(17)
    return [list(rng.randint(1, VOCAB, rng.randint(4, 14)))
            for _ in range(5)]


ENGINE_KW = dict(num_slots=2, chunk_tokens=4, prefill_chunk=8)


class TestServeUncertainties:
    def test_deterministic_scores_match_compute_uncertainties(
        self, model_and_params, prompts
    ):
        model, params = model_and_params
        gen = JaxGenerator(model, params, max_new_tokens=MAX_NEW)
        requests = [
            {"method_name": "perplexity"},
            {"method_name": "generation_entropy"},
            {"method_name": "RAUQ", "token_aggregation": "original",
             "head_aggregation": "original"},
        ]
        texts, scores = serve_uncertainties(
            model, params, None, prompts, requests,
            max_new_tokens=MAX_NEW, engine_kwargs=ENGINE_KW,
        )
        for p, text, out in zip(prompts, texts, scores):
            want_text, want = compute_uncertainties(
                gen, None, p, requests, num_samples=1,
            )
            assert list(text) == list(want_text[0])
            np.testing.assert_allclose(out["perplexity"],
                                       want["perplexity"], rtol=1e-5)
            np.testing.assert_allclose(out["generation_entropy"],
                                       want["generation_entropy"], rtol=1e-4)
            np.testing.assert_allclose(out["RAUQ_original_original"],
                                       want["RAUQ_original_original"],
                                       rtol=1e-4)

    def test_sampled_scores_collapse_at_zero_temperature(
        self, model_and_params, prompts
    ):
        """temperature -> 0: every sample is the greedy trace, so
        normalized_entropy equals the deterministic mean NLL and semantic
        entropy over identical texts is zero (one cluster)."""
        model, params = model_and_params
        same = lambda a, b: list(a) == list(b)
        texts, scores = serve_uncertainties(
            model, params, None, prompts[:3],
            [{"method_name": "normalized_entropy"},
             {"method_name": "semantic_entropy"},
             {"method_name": "perplexity"}],
            num_samples=3, max_new_tokens=MAX_NEW, temperature=1e-4,
            entailment_model=same, engine_kwargs=ENGINE_KW,
        )
        for out in scores:
            np.testing.assert_allclose(out["normalized_entropy"],
                                       out["perplexity"], rtol=1e-4)
            assert out["semantic_entropy"] == 0.0
            assert len(set(out["clusters"].values())) == 1

    def test_sampled_pass_hits_the_prefix_cache(self, model_and_params,
                                                prompts):
        """The N samples of each prompt must share its prefill (the whole
        point of engine-backed sampling)."""
        model, params = model_and_params
        from runia_core_tpu.llm.serve_uncertainty import _make_engine

        # prompts must span at least one full prefill chunk (8) for a
        # chunk-aligned prefix to be reusable
        rng = np.random.RandomState(3)
        long_prompts = [list(rng.randint(1, VOCAB, 24)) for _ in range(2)]
        eng = _make_engine(model, params,
                           max(len(p) for p in long_prompts),
                           MAX_NEW, None, False,
                           ENGINE_KW, do_sample=True, temperature=0.8)
        for p in long_prompts:
            for _ in range(3):
                eng.submit(p)
        eng.run_until_drained()
        assert eng.prefix_hits >= 3, eng.prefix_hits

    def test_fused_matches_interactive_deterministics(self, model_and_params,
                                                      prompts):
        """fused=True greedy pass = interactive pass bit-for-bit (f32 CPU;
        the fused drain's identity contract), so the deterministic scores
        must be equal."""
        model, params = model_and_params
        requests = [{"method_name": "perplexity"},
                    {"method_name": "generation_entropy"}]
        kw = dict(max_new_tokens=MAX_NEW, engine_kwargs=ENGINE_KW)
        texts_a, scores_a = serve_uncertainties(
            model, params, None, prompts, requests, **kw)
        texts_b, scores_b = serve_uncertainties(
            model, params, None, prompts, requests, fused=True, **kw)
        for ta, tb, sa, sb in zip(texts_a, texts_b, scores_a, scores_b):
            assert list(ta) == list(tb)
            np.testing.assert_allclose(sb["perplexity"], sa["perplexity"],
                                       rtol=1e-6)
            np.testing.assert_allclose(sb["generation_entropy"],
                                       sa["generation_entropy"], rtol=1e-6)

    def test_fused_sampled_collapse_at_zero_temperature(
        self, model_and_params, prompts
    ):
        model, params = model_and_params
        same = lambda a, b: list(a) == list(b)
        _, scores = serve_uncertainties(
            model, params, None, prompts[:2],
            [{"method_name": "normalized_entropy"},
             {"method_name": "semantic_entropy"},
             {"method_name": "perplexity"}],
            num_samples=3, max_new_tokens=MAX_NEW, temperature=1e-4,
            entailment_model=same, engine_kwargs=ENGINE_KW, fused=True,
        )
        for out in scores:
            np.testing.assert_allclose(out["normalized_entropy"],
                                       out["perplexity"], rtol=1e-4)
            assert out["semantic_entropy"] == 0.0

    def test_fused_rejects_rauq_and_draft(self, model_and_params, prompts):
        model, params = model_and_params
        with pytest.raises(ValueError, match="RAUQ"):
            serve_uncertainties(
                model, params, None, prompts,
                [{"method_name": "RAUQ", "token_aggregation": "original",
                  "head_aggregation": "original"}],
                engine_kwargs=ENGINE_KW, fused=True,
            )
        with pytest.raises(ValueError, match="plain decode"):
            serve_uncertainties(
                model, params, None, prompts,
                [{"method_name": "perplexity"}],
                engine_kwargs={**ENGINE_KW, "draft_model": object()},
                fused=True,
            )
        with pytest.raises(ValueError, match="chunked prefill"):
            serve_uncertainties(
                model, params, None, prompts,
                [{"method_name": "perplexity"}],
                engine_kwargs={**ENGINE_KW, "prefill_chunk": None},
                fused=True,
            )

    def test_server_reuses_engines_across_batches(self, model_and_params,
                                                  prompts):
        """The persistent server: repeated serve() calls on ONE instance.
        Deterministic scores are call-order independent (same batch twice
        gives identical results — the second pass rides the persistent
        prefix cache, so this also pins cross-batch cache correctness),
        the sampled pass draws FRESH samples each call (the engine RNG
        key advances; a reused key would repeat them), and the one-shot
        wrapper built on the server still matches it."""
        model, params = model_and_params
        requests = [{"method_name": "perplexity"},
                    {"method_name": "normalized_entropy"}]
        server = UncertaintyServer(
            model, params, None, requests, num_samples=4,
            max_new_tokens=MAX_NEW, temperature=1.0,
            engine_kwargs=ENGINE_KW,
            max_prompt_len=max(len(p) for p in prompts),
        )
        texts_a, scores_a = server.serve(prompts)
        texts_b, scores_b = server.serve(prompts)
        for ta, tb, sa, sb in zip(texts_a, texts_b, scores_a, scores_b):
            assert list(ta) == list(tb)
            np.testing.assert_allclose(sb["perplexity"], sa["perplexity"],
                                       rtol=1e-6)
        # fresh samples: on a 64-vocab model at temperature 1.0, two
        # independent 4-sample draws matching on every prompt means the
        # RNG was reused
        assert any(
            not np.allclose(sa["normalized_entropy"],
                            sb["normalized_entropy"])
            for sa, sb in zip(scores_a, scores_b)
        )
        # results maps are drained after each call (no lifetime leak);
        # interactive sampling runs MERGED (det pass + samples share the
        # one engine), so there is no separate sampled engine.
        assert not server.det_engine._results
        assert server.samp_engine is None
        # one-shot wrapper parity on a different batch
        batch2 = prompts[:3]
        texts_c, scores_c = server.serve(batch2)
        texts_d, scores_d = serve_uncertainties(
            model, params, None, batch2, requests, num_samples=4,
            max_new_tokens=MAX_NEW, engine_kwargs=ENGINE_KW,
        )
        for tc, td, sc, sd in zip(texts_c, texts_d, scores_c, scores_d):
            assert list(tc) == list(td)
            np.testing.assert_allclose(sd["perplexity"], sc["perplexity"],
                                       rtol=1e-6)

    def test_fused_server_reuses_programs_across_batches(
        self, model_and_params, prompts
    ):
        """fused=True server: the drain program is cached per workload
        shape, so a second batch of the same size reuses it (the cache key
        is shape-only — results must still be batch-specific) and scores
        match the one-shot fused wrapper."""
        model, params = model_and_params
        requests = [{"method_name": "perplexity"}]
        server = UncertaintyServer(
            model, params, None, requests, max_new_tokens=MAX_NEW,
            engine_kwargs=ENGINE_KW, fused=True,
            max_prompt_len=max(len(p) for p in prompts),
        )
        batch_a, batch_b = prompts[:3], prompts[2:]
        _, scores_a = server.serve(batch_a)
        assert len(server.det_engine._fused_cache) == 1
        texts_b, scores_b = server.serve(batch_b)
        # same workload shape -> one cached drain program, two results
        assert len(server.det_engine._fused_cache) == 1
        _, want = serve_uncertainties(
            model, params, None, batch_b, requests,
            max_new_tokens=MAX_NEW, engine_kwargs=ENGINE_KW, fused=True,
        )
        for sb, w in zip(scores_b, want):
            np.testing.assert_allclose(sb["perplexity"], w["perplexity"],
                                       rtol=1e-6)
        # different batches through the one cached program give
        # batch-specific results (prompt 0 differs between them)
        assert not np.allclose(scores_a[0]["perplexity"],
                               scores_b[0]["perplexity"])

    def test_server_capacity_validation(self, model_and_params, prompts):
        model, params = model_and_params
        with pytest.raises(ValueError, match="max_prompt_len"):
            UncertaintyServer(model, params, None,
                              [{"method_name": "perplexity"}],
                              engine_kwargs=ENGINE_KW)
        server = UncertaintyServer(
            model, params, None, [{"method_name": "perplexity"}],
            max_new_tokens=MAX_NEW, engine_kwargs=ENGINE_KW,
            max_prompt_len=16,
        )
        rng = np.random.RandomState(0)
        with pytest.raises(ValueError, match="exceeds"):
            server.serve([list(rng.randint(1, VOCAB, 40))])

    def test_validation_fails_fast(self, model_and_params, prompts):
        model, params = model_and_params
        # layer_index 15 on a 2-layer model: the engine rejects at
        # construction (the HF protocol would IndexError mid-score).
        with pytest.raises(ValueError, match="collect_hidden"):
            serve_uncertainties(model, params, None, prompts,
                                [{"method_name": "eigen_score"}])
        with pytest.raises(NotImplementedError, match="ONE hidden layer"):
            serve_uncertainties(
                model, params, None, prompts,
                [{"method_name": "eigen_score", "layer_index": -1},
                 {"method_name": "eigen_score", "layer_index": 1}],
            )
        with pytest.raises(ValueError, match="eigen_score"):
            serve_uncertainties(
                model, params, None, prompts,
                [{"method_name": "eigen_score", "layer_index": -1}],
                fused=True,
            )
        with pytest.raises(NotImplementedError, match="aggregations"):
            serve_uncertainties(
                model, params, None, prompts,
                [{"method_name": "RAUQ", "head_aggregation": "rollout"}],
            )
        with pytest.raises(KeyError, match="unknown"):
            serve_uncertainties(model, params, None, prompts,
                                [{"method_name": "nope"}])
        with pytest.raises(ValueError, match="entailment"):
            serve_uncertainties(model, params, None, prompts,
                                [{"method_name": "semantic_entropy"}])


class TestEngineServedEigenScore:
    """eigen_score through the engine's in-loop hidden-state signal."""

    def test_streamed_hidden_is_the_final_token_forward(
        self, model_and_params, prompts
    ):
        """Each result's ``hidden`` must equal the chosen-layer hidden of a
        fresh full forward over prompt + tokens[:-1] at its last position —
        the forward that produced the final token (HF hidden_states[-1])."""
        model, params = model_and_params
        from runia_core_tpu.llm.serve_uncertainty import _make_engine

        layer = -1  # post-final-norm entry
        eng = _make_engine(
            model, params, max(len(p) for p in prompts), MAX_NEW, None,
            False, ENGINE_KW, do_sample=True, temperature=0.8,
            collect_hidden=layer,
        )
        rids = [eng.submit(p) for p in prompts]
        eng.run_until_drained()
        for p, rid in zip(prompts, rids):
            res = eng.result(rid)
            toks = list(res["tokens"])
            assert res["hidden"].shape == (model.d_model,)
            seq = np.asarray([list(p) + toks[:-1]], np.int32)
            _, _, hiddens, _ = model.apply(params, seq)
            want = np.asarray(hiddens[layer, 0, -1, :])
            np.testing.assert_allclose(res["hidden"], want,
                                       rtol=2e-4, atol=2e-5)

    def test_classic_prefill_mode_streams_hidden_too(self, model_and_params):
        model, params = model_and_params
        from runia_core_tpu.llm.continuous import ContinuousBatchingEngine

        eng = ContinuousBatchingEngine(
            model, params, num_slots=2, max_ctx=64, max_new_tokens=4,
            chunk_tokens=4, do_sample=True, temperature=0.8,
            collect_hidden=1,
        )
        rng = np.random.RandomState(5)
        p = list(rng.randint(1, VOCAB, 9))
        rid = eng.submit(p)
        eng.run_until_drained()
        res = eng.result(rid)
        toks = list(res["tokens"])
        seq = np.asarray([p + toks[:-1]], np.int32)
        _, _, hiddens, _ = model.apply(params, seq)
        np.testing.assert_allclose(
            res["hidden"], np.asarray(hiddens[1, 0, -1, :]),
            rtol=2e-4, atol=2e-5,
        )

    def test_eigen_score_parity_with_compute_uncertainties(
        self, model_and_params, prompts
    ):
        """Zero-temperature collapse: every sample is the greedy trace, so
        the embedding rows are identical, the covariance vanishes, and BOTH
        paths must score exactly mean(log(alpha)) = log(1e-3)."""
        model, params = model_and_params
        requests = [{"method_name": "eigen_score", "layer_index": -1}]
        _, scores = serve_uncertainties(
            model, params, None, prompts[:2], requests,
            num_samples=3, max_new_tokens=MAX_NEW, temperature=1e-4,
            engine_kwargs=ENGINE_KW,
        )
        gen = JaxGenerator(model, params, max_new_tokens=MAX_NEW)
        for p, out in zip(prompts[:2], scores):
            _, want = compute_uncertainties(
                gen, None, p, requests, num_samples=3,
                gen_config={"temperature": 1e-4},
            )
            np.testing.assert_allclose(out["eigen_score"],
                                       want["eigen_score"], rtol=1e-6)
            np.testing.assert_allclose(out["eigen_score"], np.log(1e-3),
                                       rtol=1e-6)

    def test_eigen_score_spreads_at_real_temperature(
        self, model_and_params, prompts
    ):
        """Real sampling temperature: distinct samples must push the score
        above the degenerate log(alpha) floor."""
        model, params = model_and_params
        _, scores = serve_uncertainties(
            model, params, None, prompts[:1],
            [{"method_name": "eigen_score", "layer_index": -1}],
            num_samples=4, max_new_tokens=MAX_NEW, temperature=1.0,
            engine_kwargs=ENGINE_KW,
        )
        assert scores[0]["eigen_score"] > np.log(1e-3) + 1e-3
