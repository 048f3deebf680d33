"""End-to-end LaREx slice: model -> tap -> MC DropBlock -> entropy -> PCA ->
LaREM -> AUROC.

This is the minimum end-to-end flow from SURVEY.md section 7.2 stage 2,
mirroring the reference's integration test structure
(tests/integration_tests.py:92-199) but with hermetic synthetic data: a small
convnet is briefly trained on a two-class synthetic image task so its latent
space is structured, then LaREx must separate in-distribution images from
corrupted (OoD) images.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from runia_core_tpu.detectors import MDLatentSpace, KDELatentSpace
from runia_core_tpu.evaluation import get_dl_h_z
from runia_core_tpu.evaluation.metrics import get_auroc_results
from runia_core_tpu.extraction import FastMCDSamplesExtractor
from runia_core_tpu.inference import LaRExInference, LaRDInference, build_larex_scorer
from runia_core_tpu.models import SimpleConvNet, build_tapped_forward
from runia_core_tpu.reduction import apply_pca_ds_split, apply_pca_transform

SEED = 1
IMG = 16  # tiny images keep the CPU tests fast


def make_images(rng, n, ood=False):
    """Two-class images: class = bright blob in top/bottom half; OoD = noise."""
    labels = rng.randint(0, 2, n)
    imgs = rng.rand(n, IMG, IMG, 1).astype(np.float32) * 0.3
    for i, lab in enumerate(labels):
        if lab == 0:
            imgs[i, 2:6, 2:6, 0] += 1.0
        else:
            imgs[i, 10:14, 10:14, 0] += 1.0
    if ood:
        imgs = rng.rand(n, IMG, IMG, 1).astype(np.float32)
        imgs += np.sin(np.arange(IMG)[None, :, None, None] * 2.0).astype(np.float32)
    return imgs, labels


@pytest.fixture(scope="module")
def trained_model():
    rng = np.random.RandomState(SEED)
    model = SimpleConvNet(num_classes=2, features=8)
    x, y = make_images(rng, 256)
    variables = model.init(jax.random.key(0), jnp.asarray(x[:2]))
    tx = optax.adam(1e-2)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits, _ = model.apply({"params": p}, xb)
            return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    for i in range(30):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y)
        )
    assert float(loss) < 0.3, f"toy training failed, loss={float(loss)}"
    return model, {"params": params}


def batches(x, y, bs=64):
    for i in range(0, len(x), bs):
        yield x[i : i + bs], y[i : i + bs]


class TestEndToEndLaREx:
    def test_full_pipeline_auroc(self, trained_model):
        model, variables = trained_model
        forward = build_tapped_forward(model, variables, taps=("pre_pool",))
        rng = np.random.RandomState(SEED + 1)
        x_train, y_train = make_images(rng, 128)
        x_ind, _ = make_images(rng, 64)
        x_ood, _ = make_images(rng, 64, ood=True)

        extractor = FastMCDSamplesExtractor(
            model=forward,
            layer_type="Conv",
            reduction_method="fullmean",
            mcd_nro_samples=8,
            dropblock_probs=0.4,
            dropblock_sizes=3,
            rng=jax.random.key(2),
        )
        train_samples = extractor.get_ls_samples(batches(x_train, y_train))
        ind_samples = extractor.get_ls_samples(batches(x_ind, np.zeros(64)))
        ood_samples = extractor.get_ls_samples(batches(x_ood, np.zeros(64)))

        assert train_samples["latent_space_means"].shape == (128 * 8, 16)

        _, h_train = get_dl_h_z(train_samples["latent_space_means"], 8)
        _, h_ind = get_dl_h_z(ind_samples["latent_space_means"], 8)
        _, h_ood = get_dl_h_z(ood_samples["latent_space_means"], 8)

        h_train_pca, pca = apply_pca_ds_split(h_train, nro_components=8)
        larem = MDLatentSpace()
        larem.setup(h_train_pca)
        s_ind = larem.postprocess(apply_pca_transform(h_ind, pca))
        s_ood = larem.postprocess(apply_pca_transform(h_ood, pca))

        table = get_auroc_results("larem", s_ind, s_ood)
        assert table.loc["larem", "auroc"] > 0.8, table

    def test_larex_inference_module(self, trained_model):
        model, variables = trained_model
        forward = build_tapped_forward(model, variables)
        rng = np.random.RandomState(SEED + 2)
        x_train, _ = make_images(rng, 64)

        # Fit LaREM on entropies of the training data
        extractor = FastMCDSamplesExtractor(
            model=forward, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=8, dropblock_probs=0.4, dropblock_sizes=3,
        )
        train_s = extractor.get_ls_samples(batches(x_train, np.zeros(64)))
        _, h_train = get_dl_h_z(train_s["latent_space_means"], 8)
        larem = MDLatentSpace()
        larem.setup(h_train)

        inference = LaRExInference(
            model=forward,
            postprocessor=larem,
            drop_block_prob=0.4,
            drop_block_size=3,
            mcd_samples_nro=8,
        )
        x_new, _ = make_images(rng, 4)
        outputs, scores = inference.get_score(x_new, layer_hook="pre_pool")
        assert np.asarray(outputs).shape == (4, 2)
        assert scores.shape == (4,)
        # timing twin
        (_, scores2), dt = inference.test_time_inference(x_new)
        assert dt > 0 and scores2.shape == (4,)

    def test_lard_inference_module(self, trained_model):
        model, variables = trained_model
        forward = build_tapped_forward(model, variables)
        rng = np.random.RandomState(SEED + 3)
        x_train, _ = make_images(rng, 64)
        _, taps = forward(jnp.asarray(x_train))
        feats = np.asarray(jnp.mean(taps["pre_pool"], axis=(1, 2)))
        kde = KDELatentSpace()
        kde.setup(feats)
        lard = LaRDInference(model=forward, postprocessor=kde)
        x_new, _ = make_images(rng, 4)
        outputs, scores = lard.get_score(x_new)
        assert scores.shape == (4,)

    def test_fused_scorer_matches_module(self, trained_model):
        """The one-program fused scorer must agree with the step-by-step path."""
        model, variables = trained_model
        forward = build_tapped_forward(model, variables)
        rng = np.random.RandomState(SEED + 4)
        x_train, _ = make_images(rng, 64)

        extractor = FastMCDSamplesExtractor(
            model=forward, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=8, dropblock_probs=0.4, dropblock_sizes=3,
        )
        train_s = extractor.get_ls_samples(batches(x_train, np.zeros(64)))
        _, h_train = get_dl_h_z(train_s["latent_space_means"], 8)
        larem = MDLatentSpace()
        larem.setup(h_train)

        scorer = build_larex_scorer(
            forward,
            pca_state=None,
            detector_state=larem.state,
            mcd_samples_nro=8,
            drop_block_prob=0.4,
            drop_block_size=3,
        )
        x_new, _ = make_images(rng, 8)
        key = jax.random.key(9)
        logits, fused_scores = scorer(jnp.asarray(x_new), key)

        inference = LaRExInference(
            model=forward, postprocessor=larem,
            drop_block_prob=0.4, drop_block_size=3, mcd_samples_nro=8,
        )
        _, module_scores = inference.get_score(x_new, key=key)
        np.testing.assert_allclose(
            np.asarray(fused_scores), module_scores, rtol=1e-3, atol=1e-3
        )
