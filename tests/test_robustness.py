"""Failure-handling robustness (SURVEY.md section 5 "Failure detection"):
jitter ladder on singular covariances, NaN-class -inf handling, threshold
edge cases."""

import numpy as np
import pytest

import jax.numpy as jnp

from runia_core_tpu.detectors import (
    GMMLatentSpace,
    Mahalanobis,
    cMDLatentSpace,
    get_method_threshold,
    gmm_fit,
)
from runia_core_tpu.config import Config


class TestJitterLadder:
    def test_rank_deficient_covariance(self, rng):
        """A class whose samples live on a low-rank subspace has a singular
        covariance; the jitter ladder (reference funcs.py:287,325-343) must
        still produce a usable Cholesky."""
        d = 8
        base = rng.randn(30, 2) @ rng.randn(2, d)  # rank-2 data in 8-d
        feats = np.concatenate([base, rng.randn(30, d)]).astype(np.float32)
        labels = np.concatenate([np.zeros(30), np.ones(30)]).astype(int)
        state, jitter = gmm_fit(feats, labels, num_classes=2)
        assert jitter > 0  # the ladder had to engage
        logp = np.asarray(state.log_prob(feats[:5]))
        assert np.isfinite(logp).all()

    def test_single_sample_class(self, rng):
        """n == 1 per class uses the divide-by-one guard (funcs.py:289-294)."""
        feats = rng.randn(11, 4).astype(np.float32)
        labels = np.array([0] * 10 + [1])
        state, _ = gmm_fit(feats, labels, num_classes=2)
        assert state.means.shape[0] == 2
        assert np.isfinite(np.asarray(state.log_prob(feats[:3]))).all()


class TestNaNClassHandling:
    def test_cmd_missing_class_warns_and_scores(self, rng):
        feats = rng.randn(40, 6).astype(np.float32)
        labels = rng.randint(0, 2, 40)  # classes 2,3 empty
        cmd = cMDLatentSpace(cfg=Config(num_classes=4))
        with pytest.warns(UserWarning, match="No examples for class"):
            cmd.setup(feats, ind_train_labels=labels)
        scores = cmd.postprocess(rng.randn(5, 6).astype(np.float32),
                                 pred_labels=np.zeros(5))
        assert np.isfinite(scores).all()  # NaN classes mapped to -inf, max over rest

    def test_mahalanobis_missing_class(self, rng):
        feats = rng.randn(40, 6).astype(np.float32)
        labels = rng.randint(0, 2, 40)
        m = Mahalanobis(num_classes=3)
        with pytest.warns(UserWarning):
            m.setup(feats, train_labels=labels, valid_feats=feats[:10])
        assert np.isfinite(m.postprocess(feats[:5])).all()

    def test_gmm_latent_space_drops_empty(self, rng):
        feats = rng.randn(40, 6).astype(np.float32)
        labels = rng.randint(0, 2, 40)
        g = GMMLatentSpace(cfg=Config(num_classes=5))
        g.setup(feats, ind_train_labels=labels)
        assert g.gmm.means.shape[0] == 2
        assert np.isfinite(g.postprocess(feats[:5])).all()


class TestThresholdEdges:
    def test_constant_scores(self):
        # std == 0 -> threshold == mean
        assert get_method_threshold(np.full(10, 3.0), 1.645) == pytest.approx(3.0)

    def test_custom_z(self, rng):
        s = rng.randn(100)
        assert get_method_threshold(s, 2.0) == pytest.approx(s.mean() - 2 * s.std())


class TestReviewRegressions:
    def test_config_nested_write_persists(self):
        from runia_core_tpu.config import Config

        cfg = Config(sub={"x": 1})
        cfg.sub.x = 5
        assert cfg.sub.x == 5
        assert cfg.to_dict() == {"sub": {"x": 5}}

    def test_checkpoint_numpy_scalars(self, tmp_path):
        from runia_core_tpu.checkpoint import load_state_dict, save_state_dict

        state = {"threshold": np.float32(0.25), "k": np.int64(3),
                 "arr": np.arange(4.0)}
        path = tmp_path / "s.npz"
        save_state_dict(path, state)
        loaded = load_state_dict(path)
        assert loaded["threshold"] == pytest.approx(0.25)
        assert loaded["k"] == 3

    def test_perplexity_ignores_post_eos_padding(self):
        from runia_core_tpu.llm.scores import perplexity

        assert np.isfinite(perplexity(np.array([-1.0, -2.0, -np.inf])))
        assert perplexity(np.array([-1.0, -2.0, -np.inf])) == pytest.approx(1.5)

    def test_generate_pads_with_eos_after_finish(self):
        from runia_core_tpu.llm import JaxGenerator
        from runia_core_tpu.models.transformer import CausalLM

        import jax
        import jax.numpy as jnp

        model = CausalLM(vocab_size=16, num_layers=1, num_heads=2,
                         d_model=16, max_len=64)
        params = model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
        probe = JaxGenerator(model, params, max_new_tokens=8).generate(
            prompt_tokens=[1, 2, 3], do_sample=False,
            output_attentions=False, output_hidden_states=False,
        )
        eos = int(probe["sequences"][0][4])  # 2nd generated token
        out = JaxGenerator(model, params, max_new_tokens=8, eos_id=eos).generate(
            prompt_tokens=[1, 2, 3], do_sample=True, key=jax.random.key(1),
            output_attentions=False, output_hidden_states=False,
        )
        seq = np.asarray(out["sequences"][0][3:])
        hits = np.where(seq == eos)[0]
        if hits.size:  # everything after the first EOS is EOS padding
            assert (seq[hits[0]:] == eos).all()

    def test_prefetch_loader_early_exit_no_leak(self):
        import threading

        from runia_core_tpu.data import PrefetchLoader

        images = (np.random.RandomState(0).rand(64, 8, 8, 3) * 255).astype(np.uint8)
        loader = PrefetchLoader(images, np.zeros(64), batch_size=8,
                                device_put=False, prefetch_depth=2)
        before = threading.active_count()
        for i, _ in enumerate(loader):
            if i == 1:
                break
        # generator close runs the finally: producer released and joined
        import gc; gc.collect()
        import time
        for _ in range(50):
            if threading.active_count() <= before:
                break
            time.sleep(0.1)
        assert threading.active_count() <= before
        # loader remains usable after an early exit
        n = sum(1 for _ in loader)
        assert n == 8
