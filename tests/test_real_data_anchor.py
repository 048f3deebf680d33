"""Real-weights, real-data LaREx anchor.

The reference proves its flagship flow on a real trained net with real images
(MNIST InD vs EMNIST OoD, reference tests/integration_tests.py:92-199). This
environment has no network egress, so the real corpora are the ones bundled
inside sklearn: ``load_digits`` (1,797 scanned 8x8 handwritten digits) as InD
and grayscale patches of ``load_sample_images`` (two real photographs) as the
cross-dataset OoD — the same same-sensor-vs-different-world shift the
reference's MNIST/EMNIST protocol tests. The protocol mirrors the
reference's:

  1. Train a convnet in-repo (``training.fit_classifier``) on the ten digit
     classes until it generalizes (accuracy gate on a held-out split).
  2. Run the full LaREx pipeline on trained weights: tap -> MC DropBlock ->
     per-dim KL entropy -> PCA -> LaREM/LaRED -> AUROC against the
     natural-image patches.
  3. Gate AUROC absolutely (the detector must separate real InD from real
     OoD; the reference pins ~0.81 on its MNIST/EMNIST run) and against the
     reference-composed pipeline (sklearn PCA + EmpiricalCovariance +
     roc_auc_score on identical entropy features) within BASELINE.md's 0.1%
     parity budget.
"""

import numpy as np
import pytest
from sklearn.covariance import EmpiricalCovariance
from sklearn.datasets import load_digits, load_sample_images
from sklearn.decomposition import PCA as SkPCA
from sklearn.metrics import roc_auc_score
from sklearn.neighbors import KernelDensity

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import KDELatentSpace, MDLatentSpace
from runia_core_tpu.evaluation import get_dl_h_z
from runia_core_tpu.evaluation.metrics import get_auroc_results
from runia_core_tpu.extraction import FastMCDSamplesExtractor
from runia_core_tpu.models import SimpleConvNet, build_tapped_forward
from runia_core_tpu.reduction import apply_pca_ds_split, apply_pca_transform
from runia_core_tpu.training import fit_classifier

SEED = 7
MC = 8
IMG = 16
PARITY = 1e-3  # BASELINE.md: AUROC within 0.1% of the reference composition


def _real_data():
    """InD: real scanned digits (all 10 classes), upsampled 8x8 -> 16x16 by
    pixel replication. OoD: 16x16 grayscale patches cropped from sklearn's
    two bundled photographs — real natural images, a cross-dataset shift."""
    d = load_digits()
    images = np.kron(d.images / 16.0, np.ones((2, 2))).astype(np.float32)
    images = images[..., None]
    labels = d.target
    rng = np.random.RandomState(SEED)
    perm = rng.permutation(len(images))
    images, labels = images[perm], labels[perm]
    n_train = int(0.7 * len(images))

    patches = []
    for photo in load_sample_images().images:
        gray = photo.mean(-1).astype(np.float32) / 255.0
        for i in range(0, gray.shape[0] - IMG, 40):
            for j in range(0, gray.shape[1] - IMG, 40):
                patches.append(gray[i : i + IMG, j : j + IMG])
    x_ood = np.stack(patches)[..., None].astype(np.float32)

    return (
        (images[:n_train], labels[:n_train]),
        (images[n_train:], labels[n_train:]),
        x_ood,
    )


@pytest.fixture(scope="module")
def trained_on_digits():
    (x_tr, y_tr), (x_te, y_te), x_ood = _real_data()
    model = SimpleConvNet(num_classes=10, features=8)

    # fit_classifier re-iterates data_iter once per epoch, so it must be a
    # re-iterable container, not a one-shot generator.
    batches = [
        (x_tr[i : i + 64], y_tr[i : i + 64]) for i in range(0, len(x_tr), 64)
    ]
    variables, metrics = fit_classifier(
        model,
        batches,
        jax.random.key(SEED),
        jnp.asarray(x_tr[:2]),
        epochs=60,
        learning_rate=5e-3,
    )
    forward = build_tapped_forward(model, variables, taps=("pre_pool",))
    logits, _ = forward(jnp.asarray(x_te))
    acc = float((np.argmax(np.asarray(logits), -1) == y_te).mean())
    assert acc > 0.9, f"real-digits training failed to generalize: acc={acc:.3f}"
    return forward, (x_tr, y_tr), (x_te, y_te), x_ood


def _entropies(forward, x, key):
    extractor = FastMCDSamplesExtractor(
        model=forward,
        layer_type="Conv",
        reduction_method="fullmean",
        mcd_nro_samples=MC,
        dropblock_probs=0.4,
        dropblock_sizes=3,
        rng=key,
    )
    samples = extractor.get_ls_samples(
        [(x[i : i + 256], np.zeros(len(x[i : i + 256]))) for i in range(0, len(x), 256)]
    )["latent_space_means"]
    _, h = get_dl_h_z(samples, MC)
    return np.asarray(h)


@pytest.fixture(scope="module")
def real_entropies(trained_on_digits):
    forward, (x_tr, _), (x_te, _), x_ood = trained_on_digits
    h_train = _entropies(forward, x_tr, jax.random.key(1))
    h_ind = _entropies(forward, x_te, jax.random.key(2))
    h_ood = _entropies(forward, x_ood, jax.random.key(3))
    return h_train, h_ind, h_ood


class TestRealDataAnchor:
    def test_real_larex_auroc_and_parity(self, real_entropies):
        h_train, h_ind, h_ood = real_entropies

        n_comp = 8
        h_tr_pca, pca = apply_pca_ds_split(h_train, nro_components=n_comp)
        larem = MDLatentSpace()
        larem.setup(h_tr_pca)
        s_ind = np.asarray(larem.postprocess(apply_pca_transform(h_ind, pca)))
        s_ood = np.asarray(larem.postprocess(apply_pca_transform(h_ood, pca)))

        table = get_auroc_results("larem", s_ind, s_ood)
        auroc = float(table.loc["larem", "auroc"])
        # Real-data absolute gate: trained weights + real cross-dataset OoD
        # must separate. (The reference pins ~0.81 on its MNIST/EMNIST run.)
        assert auroc > 0.8, f"real-data LaREM AUROC too low: {auroc:.4f}"

        # Reference-composed LaREM on the SAME entropy features: sklearn
        # whitened PCA + EmpiricalCovariance Mahalanobis + sklearn ROC
        # (reference postprocessors.py:202-243, metrics.py:37-100).
        sk_pca = SkPCA(n_components=n_comp, svd_solver="full", whiten=True).fit(
            h_train
        )
        tr = sk_pca.transform(h_train)
        mean = tr.mean(0, keepdims=True)
        prec = EmpiricalCovariance().fit(tr - mean).precision_

        def ref_score(h):
            diff = sk_pca.transform(h) - mean
            return -np.einsum("nd,de,ne->n", diff, prec, diff)

        ref_auroc = roc_auc_score(
            np.r_[np.ones(len(h_ind)), np.zeros(len(h_ood))],
            np.r_[ref_score(h_ind), ref_score(h_ood)],
        )
        assert abs(auroc - ref_auroc) < PARITY, (
            f"AUROC parity gate: ours={auroc:.6f} ref={ref_auroc:.6f}"
        )

    def test_real_lared_auroc_and_parity(self, real_entropies):
        h_train, h_ind, h_ood = real_entropies

        h_tr_pca, pca = apply_pca_ds_split(h_train, nro_components=8)
        lared = KDELatentSpace()
        lared.setup(h_tr_pca)
        s_ind = np.asarray(lared.postprocess(apply_pca_transform(h_ind, pca)))
        s_ood = np.asarray(lared.postprocess(apply_pca_transform(h_ood, pca)))
        auroc = float(get_auroc_results("lared", s_ind, s_ood).loc["lared", "auroc"])
        assert auroc > 0.8, f"real-data LaRED AUROC too low: {auroc:.4f}"

        # Reference composition: sklearn KernelDensity on the same PCA space.
        kde = KernelDensity().fit(np.asarray(h_tr_pca))
        ref_ind = kde.score_samples(np.asarray(apply_pca_transform(h_ind, pca)))
        ref_ood = kde.score_samples(np.asarray(apply_pca_transform(h_ood, pca)))
        ref_auroc = roc_auc_score(
            np.r_[np.ones(len(ref_ind)), np.zeros(len(ref_ood))],
            np.r_[ref_ind, ref_ood],
        )
        assert abs(auroc - ref_auroc) < PARITY, (
            f"AUROC parity gate: ours={auroc:.6f} ref={ref_auroc:.6f}"
        )

    def test_msp_baseline_on_real_data(self, trained_on_digits):
        """Logit-space baseline on the same real data (reference baselines
        protocol): max-softmax must also separate the natural patches, and
        must also separate held-out unseen-class digits (open-set split)."""
        forward, _, (x_te, _), x_ood = trained_on_digits
        msp = lambda x: np.asarray(
            jax.nn.softmax(forward(jnp.asarray(x))[0], -1).max(-1)
        )
        auroc = roc_auc_score(
            np.r_[np.ones(len(x_te)), np.zeros(len(x_ood))],
            np.r_[msp(x_te), msp(x_ood)],
        )
        assert auroc > 0.7, f"MSP on real data too low: {auroc:.4f}"
