"""GenerationService request-batching tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.llm import GenerationService, JaxGenerator
from runia_core_tpu.models import LlamaLM


@pytest.fixture(scope="module")
def generator():
    model = LlamaLM(vocab_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
                    d_model=32, hidden_dim=64, max_len=64)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    return JaxGenerator(model, params, max_new_tokens=5)


class TestGenerationService:
    def test_batched_results_match_direct_decode(self, generator):
        service = GenerationService(generator, max_batch=8, max_wait_s=0.2)
        prompts = [[1, 2, 3, 4], [9, 8], [5, 5, 5], [7, 7, 7, 7]]
        try:
            futures = [service.submit(p) for p in prompts]
            results = [f.result(timeout=120) for f in futures]
        finally:
            service.close()
        for p, res in zip(prompts, results):
            want = generator.generate_batch([p], do_sample=False,
                                            output_scores=False)
            assert res["prompt_length"] == len(p)
            np.testing.assert_array_equal(
                res["sequences"][0], np.asarray(want["sequences"][0])
            )
            np.testing.assert_allclose(
                res["log_probs"], np.asarray(want["log_probs"][0]), atol=1e-5
            )

    def test_errors_propagate_to_futures(self, generator):
        service = GenerationService(generator, max_batch=2, max_wait_s=0.05)
        try:
            bad = service.submit([None])  # non-integer token: decode fails
            with pytest.raises(BaseException):
                bad.result(timeout=120)
        finally:
            service.close()

    def test_submit_after_close_raises(self, generator):
        service = GenerationService(generator)
        service.close()
        with pytest.raises(RuntimeError):
            service.submit([1, 2])

    def test_close_drains_outstanding(self, generator):
        service = GenerationService(generator, max_batch=4, max_wait_s=0.05)
        futures = [service.submit([1, 2, 3]) for _ in range(3)]
        service.close()
        for f in futures:
            assert f.done()
            assert f.result()["prompt_length"] == 3

    def test_sampled_service(self, generator):
        service = GenerationService(generator, max_batch=4, max_wait_s=0.1,
                                    do_sample=True, temperature=1.0)
        try:
            futures = [service.submit([1, 2, 3]) for _ in range(4)]
            results = [f.result(timeout=120) for f in futures]
        finally:
            service.close()
        gens = {tuple(r["sequences"][0][-5:].tolist()) for r in results}
        assert len(gens) > 1  # sampled continuations differ across requests

    def test_length_bucketing_collapses_shapes(self, generator):
        service = GenerationService(generator, max_batch=2, max_wait_s=0.01,
                                    length_bucket=16)
        try:
            service.submit([1, 2, 3]).result(timeout=120)
            service.submit([4, 5, 6, 7, 8]).result(timeout=120)
            # both requests pad to the same 16-slot bucket -> ONE compiled
            # (batch, length) decode config
            batch_cfgs = {k for k in generator._decode_cache if k[0] == "batch"
                          and k[1] == 2 and k[2] == 16}
            assert len(batch_cfgs) == 1, generator._decode_cache.keys()
        finally:
            service.close()
