"""ScoringService: pipelined serving loop over the fused scorer.

Checks: stream results are in order and identical to direct scorer calls
with the same folded keys; ragged tails are padded and trimmed; the
in-flight window drains completely."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.inference import ScoringService, build_larex_scorer
from runia_core_tpu.models import SimpleConvNet, build_tapped_forward

B, IMG = 8, 16


@pytest.fixture(scope="module")
def scorer():
    r = np.random.RandomState(0)
    model = SimpleConvNet(num_classes=3, features=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    forward = build_tapped_forward(model, variables)
    md = MDLatentSpace()
    md.setup(r.randn(64, 16).astype(np.float32))
    return build_larex_scorer(
        forward, pca_state=None, detector_state=md.state,
        mcd_samples_nro=4, drop_block_prob=0.4, drop_block_size=3,
    )


class TestScoreStream:
    def test_matches_direct_calls_in_order(self, scorer, rng):
        key = jax.random.key(3)
        batches = [rng.rand(B, IMG, IMG, 3).astype(np.float32) for _ in range(7)]
        service = ScoringService(scorer, key=key, max_in_flight=3)
        got = list(service.score_stream(iter(batches)))
        assert len(got) == 7
        for i, (logits, scores) in enumerate(got):
            ref_logits, ref_scores = scorer(
                jnp.asarray(batches[i]), jax.random.fold_in(key, i)
            )
            np.testing.assert_allclose(logits, np.asarray(ref_logits), rtol=1e-5)
            np.testing.assert_allclose(scores, np.asarray(ref_scores), rtol=1e-5)

    def test_tuple_batches_extras_ignored(self, scorer, rng):
        service = ScoringService(scorer, key=jax.random.key(0))
        batches = [(rng.rand(B, IMG, IMG, 3).astype(np.float32), np.arange(B))
                   for _ in range(2)]
        out = list(service.score_stream(iter(batches)))
        assert len(out) == 2 and out[0][1].shape == (B,)

    def test_window_smaller_than_stream(self, scorer, rng):
        service = ScoringService(scorer, key=jax.random.key(0), max_in_flight=1)
        out = list(service.score_stream(
            rng.rand(B, IMG, IMG, 3).astype(np.float32) for _ in range(4)
        ))
        assert len(out) == 4

    def test_invalid_window(self, scorer):
        with pytest.raises(ValueError):
            ScoringService(scorer, max_in_flight=0)


class TestScoreDataset:
    def test_ragged_tail_trimmed(self, scorer, rng):
        n = 3 * B + 5  # last batch short by 3
        images_u8 = (rng.rand(n, IMG, IMG, 3) * 255).astype(np.uint8)
        service = ScoringService(scorer, key=jax.random.key(9))
        logits, scores = service.score_dataset(images_u8, batch_size=B)
        assert logits.shape == (n, 3) and scores.shape == (n,)
        assert np.isfinite(scores).all()

    def test_valid_rows_unaffected_by_padding(self, scorer, rng):
        """The real rows of a padded tail batch score identically to the
        same rows in an exact-size run (per-image independence)."""
        images_u8 = (rng.rand(B + 2, IMG, IMG, 3) * 255).astype(np.uint8)
        service = ScoringService(scorer, key=jax.random.key(4))
        _, scores = service.score_dataset(images_u8, batch_size=B)
        # First batch alone, same key fold (batch 0)
        direct_logits, direct_scores = scorer(
            jnp.asarray(images_u8[:B].astype(np.float32) / 255.0),
            jax.random.fold_in(jax.random.key(4), 0),
        )
        np.testing.assert_allclose(
            scores[:B], np.asarray(direct_scores), rtol=1e-4, atol=1e-5
        )


class TestPipelineCheckpoint:
    def test_scorer_roundtrip(self, scorer, rng, tmp_path):
        """save_larex_pipeline + load_larex_scorer reproduces the original
        fused scorer bit-for-bit (same model forward, same key)."""
        from runia_core_tpu.checkpoint import (
            load_larex_scorer,
            save_larex_pipeline,
        )
        from runia_core_tpu.models import SimpleConvNet, build_tapped_forward
        from runia_core_tpu.reduction import apply_pca_ds_split
        from runia_core_tpu.detectors import MDLatentSpace

        model = SimpleConvNet(num_classes=3, features=8)
        variables = model.init(jax.random.key(1), jnp.zeros((1, IMG, IMG, 3)))
        forward = build_tapped_forward(model, variables)
        h_train = rng.randn(64, 16).astype(np.float32)
        h_pca, pca_state = apply_pca_ds_split(h_train, nro_components=8)
        md = MDLatentSpace()
        md.setup(h_pca)

        from runia_core_tpu.inference import build_larex_scorer

        original = build_larex_scorer(
            forward, pca_state=pca_state, detector_state=md.state,
            mcd_samples_nro=4, drop_block_prob=0.4, drop_block_size=3,
        )
        path = tmp_path / "pipeline.npz"
        save_larex_pipeline(
            path, pca_state, md.state,
            mcd_samples_nro=4, drop_block_prob=0.4, drop_block_size=3,
        )
        restored = load_larex_scorer(path, forward)

        images = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
        key = jax.random.key(5)
        _, s0 = original(images, key)
        _, s1 = restored(images, key)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))

    def test_no_pca_roundtrip(self, scorer, rng, tmp_path):
        from runia_core_tpu.checkpoint import (
            load_larex_scorer,
            save_larex_pipeline,
        )
        from runia_core_tpu.detectors import MDLatentSpace
        from runia_core_tpu.models import SimpleConvNet, build_tapped_forward

        model = SimpleConvNet(num_classes=3, features=8)
        variables = model.init(jax.random.key(1), jnp.zeros((1, IMG, IMG, 3)))
        forward = build_tapped_forward(model, variables)
        md = MDLatentSpace()
        md.setup(rng.randn(64, 16).astype(np.float32))
        path = tmp_path / "nopca.npz"
        save_larex_pipeline(path, None, md.state, mcd_samples_nro=4)
        restored = load_larex_scorer(path, forward)
        images = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
        _, s = restored(images, jax.random.key(2))
        assert s.shape == (B,) and np.isfinite(np.asarray(s)).all()


class TestServiceHealth:
    def test_check_finite_raises_with_batch_index(self, rng):
        from runia_core_tpu.utils import NonFiniteError

        def bad_scorer(images, key):
            return jnp.zeros((images.shape[0], 2)), jnp.full(
                (images.shape[0],), jnp.nan
            )

        service = ScoringService(
            bad_scorer, key=jax.random.key(0), max_in_flight=2,
            check_finite=True,
        )
        with pytest.raises(NonFiniteError, match="batch 0"):
            list(service.score_stream(
                rng.rand(B, IMG, IMG, 3).astype(np.float32) for _ in range(3)
            ))

    def test_arbitrary_output_pytree(self, rng):
        def dict_scorer(images, key):
            return {"mean": images.mean(axis=(1, 2, 3)), "n": images.shape[0]}

        service = ScoringService(dict_scorer, key=jax.random.key(0))
        out = list(service.score_stream(
            rng.rand(B, IMG, IMG, 3).astype(np.float32) for _ in range(2)
        ))
        assert len(out) == 2 and out[0]["mean"].shape == (B,)


class TestServiceResize:
    def test_score_dataset_with_resize(self, scorer, rng):
        """Arbitrary-size inputs resize on the host to the model size."""
        images_u8 = (rng.rand(2 * B + 1, 2 * IMG, 2 * IMG, 3) * 255).astype(
            np.uint8
        )
        service = ScoringService(scorer, key=jax.random.key(1))
        logits, scores = service.score_dataset(
            images_u8, batch_size=B, resize_to=(IMG, IMG)
        )
        assert scores.shape == (2 * B + 1,)
        assert np.isfinite(scores).all()
