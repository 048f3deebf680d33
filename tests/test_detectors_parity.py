"""Definitional-parity tests for the OoD detectors.

The reference's golden values are torch-RNG-bound and do not transfer
(SURVEY.md section 4); instead we verify our JAX implementations against the
*definitions* — sklearn (EmpiricalCovariance, KernelDensity), scipy, and
torch.distributions — on seeded synthetic data, which is exactly what the
reference implementations call into.
"""

import numpy as np
import pytest
import scipy.special
from sklearn.covariance import EmpiricalCovariance
from sklearn.neighbors import KernelDensity

import runia_core_tpu  # noqa: F401  (registers everything)
from runia_core_tpu.config import Config
from runia_core_tpu.detectors import (
    ASH,
    DDU,
    DICE,
    DICEReAct,
    GEN,
    KNN,
    MSP,
    Energy,
    GMMLatentSpace,
    KDELatentSpace,
    KNNLatentSpace,
    LaREMPostprocessor,
    MDLatentSpace,
    Mahalanobis,
    ReAct,
    ViM,
    cMDLatentSpace,
    postprocessor_input_dict,
    postprocessors_dict,
)
from runia_core_tpu.detectors.funcs import (
    ash_s_linear_layer,
    generalized_entropy,
    get_predictive_uncertainty_score,
    gmm_fit,
)

SEED = 1
TOL = 1e-4


def make_features(rng, n=200, d=16, num_classes=4, shift=0.0):
    labels = rng.randint(0, num_classes, size=n)
    centers = rng.randn(num_classes, d) * 2.0
    feats = centers[labels] + rng.randn(n, d) + shift
    return feats.astype(np.float32), labels.astype(np.int64)


@pytest.fixture
def data(rng):
    train, train_labels = make_features(rng)
    valid, valid_labels = make_features(rng, n=100)
    ood, _ = make_features(rng, n=100, shift=3.0)
    return dict(
        train=train,
        train_labels=train_labels,
        valid=valid,
        valid_labels=valid_labels,
        ood=ood,
    )


@pytest.fixture
def fc_params(rng, data):
    d = data["train"].shape[1]
    num_classes = 4
    w = rng.randn(num_classes, d).astype(np.float32) * 0.3
    b = rng.randn(num_classes).astype(np.float32) * 0.1
    return {"weight": w, "bias": b}


def logits_of(feats, fc):
    return feats @ fc["weight"].T + fc["bias"]


class TestRegistry:
    def test_all_sixteen_registered(self):
        expected = {
            "KDE", "MD", "cMD", "KNN", "GMM",
            "energy", "msp", "gen",
            "ddu", "knn", "mahalanobis", "vim", "ash", "dice", "react", "dice_react",
        }
        assert expected.issubset(set(postprocessors_dict.keys()))

    def test_aliases(self):
        assert postprocessors_dict["LaRED"] is postprocessors_dict["KDE"]
        assert postprocessors_dict["LaREM"] is postprocessors_dict["MD"]
        assert postprocessors_dict["LaREK"] is postprocessors_dict["KNN"]

    def test_input_kinds(self):
        assert postprocessor_input_dict["MD"] == ["latent_space_means"]
        assert postprocessor_input_dict["vim"] == ["features", "logits"]
        assert postprocessor_input_dict["energy"] == ["logits"]

    def test_uniform_construction(self):
        # Every registered class must be constructible as cls(cfg=cfg)
        # (fixes the reference quirk, SURVEY.md section 7.4).
        cfg = Config(num_classes=4, k_neighbors=5)
        for name, cls in postprocessors_dict.items():
            cls(cfg=cfg)


class TestMD:
    def test_matches_sklearn(self, data):
        md = MDLatentSpace()
        md.setup(data["train"])
        ours = md.postprocess(data["valid"])

        mean = data["train"].mean(0, keepdims=True)
        centered = data["train"] - mean
        ec = EmpiricalCovariance(assume_centered=False).fit(centered)
        diff = data["valid"] - mean
        expected = -np.diag(diff @ ec.precision_ @ diff.T)
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-2)

    def test_double_setup_warns(self, data):
        md = MDLatentSpace()
        md.setup(data["train"])
        with pytest.warns(UserWarning):
            md.setup(data["train"])

    def test_larem_alias_is_md(self):
        assert LaREMPostprocessor is MDLatentSpace

    def test_state_roundtrip(self, data):
        md = MDLatentSpace()
        md.setup(data["train"])
        scores = md.postprocess(data["valid"])
        md2 = MDLatentSpace()
        md2.feats_mean = md.state["feats_mean"]
        md2.precision = md.state["precision"]
        md2.load_state(md.state)
        np.testing.assert_allclose(md2.postprocess(data["valid"]), scores)


class TestKDE:
    def test_matches_exact_definition(self, data):
        kde = KDELatentSpace()
        kde.setup(data["train"])
        ours = kde.postprocess(data["valid"])
        # Exact float64 gaussian-KDE log density. (sklearn's tree-based
        # score_samples itself deviates from this by up to ~12 nats in the
        # far tail where the kernel sum underflows; our matmul+logsumexp is
        # the more exact evaluation of the same definition.)
        t = data["train"].astype(np.float64)
        v = data["valid"].astype(np.float64)
        d2 = ((v[:, None, :] - t[None, :, :]) ** 2).sum(-1)
        n, d = t.shape
        expected = (
            scipy.special.logsumexp(-0.5 * d2, axis=1)
            - np.log(n)
            - d / 2 * np.log(2 * np.pi)
        )
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-3)

    def test_close_to_sklearn_in_bulk(self, data):
        # Where the density is not astronomically small, sklearn's tree KDE
        # and our exact evaluation agree tightly.
        kde = KDELatentSpace()
        kde.setup(data["train"])
        ours = kde.postprocess(data["valid"])
        sk = KernelDensity(kernel="gaussian", bandwidth=1.0).fit(data["train"])
        expected = sk.score_samples(data["valid"])
        bulk = expected > -48.0
        assert bulk.sum() > 20
        np.testing.assert_allclose(ours[bulk], expected[bulk], rtol=1e-4, atol=1e-3)


class TestCMD:
    def test_matches_reference_definition(self, data):
        cfg = Config(num_classes=4)
        cmd = cMDLatentSpace(cfg=cfg)
        cmd.setup(data["train"], ind_train_labels=data["train_labels"])
        ours = cmd.postprocess(data["valid"], pred_labels=data["valid_labels"])

        # Reference definition: per-class means, shared EmpiricalCovariance on
        # concatenated class-centered data, max over classes of -quadform.
        class_means, centered = [], []
        for c in range(4):
            cls_samples = data["train"][data["train_labels"] == c]
            class_means.append(cls_samples.mean(0))
            centered.append(cls_samples - class_means[c][None])
        ec = EmpiricalCovariance(assume_centered=False).fit(
            np.concatenate(centered).astype(np.float32)
        )
        expected = []
        for feat in data["valid"]:
            scores_c = []
            for c in range(4):
                t = feat - class_means[c]
                scores_c.append(-t @ ec.precision_ @ t)
            expected.append(max(scores_c))
        np.testing.assert_allclose(ours, np.array(expected), rtol=1e-3, atol=1e-2)

    def test_missing_labels_raises(self, data):
        cmd = cMDLatentSpace(cfg=Config(num_classes=4))
        with pytest.raises(ValueError):
            cmd.setup(data["train"])


class TestKNNLatent:
    def test_matches_bruteforce(self, data):
        cfg = Config(k_neighbors=5)
        knn = KNNLatentSpace(cfg=cfg)
        knn.setup(data["train"])
        ours = knn.postprocess(data["valid"])

        def norm(x):
            return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)

        tr, te = norm(data["train"]), norm(data["valid"])
        d2 = ((te[:, None, :] - tr[None, :, :]) ** 2).sum(-1)
        expected = -np.sort(d2, axis=1)[:, 4]  # squared distance (faiss semantics)
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-5)


class TestGMM:
    def test_matches_torch_mvn(self, data):
        torch = pytest.importorskip("torch")
        state, _ = gmm_fit(data["train"], data["train_labels"], num_classes=4)
        ours = np.asarray(state.log_prob(data["valid"]))

        means, covs = [], []
        for c in range(4):
            cls = torch.from_numpy(data["train"][data["train_labels"] == c])
            mu = cls.mean(0)
            xc = cls - mu
            n = max(cls.shape[0] - 1, 1)
            covs.append(xc.t().mm(xc) / n)
            means.append(mu)
        mvn = torch.distributions.MultivariateNormal(
            loc=torch.stack(means), covariance_matrix=torch.stack(covs)
        )
        expected = mvn.log_prob(
            torch.from_numpy(data["valid"][:, None, :])
        ).numpy()
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-2)

    def test_gmm_latent_space_scores(self, data):
        g = GMMLatentSpace(cfg=Config(num_classes=4))
        g.setup(data["train"], ind_train_labels=data["train_labels"])
        scores = g.postprocess(data["valid"])
        assert scores.shape == (100,)
        assert np.isfinite(scores).all()

    def test_empty_class_dropped(self, rng):
        feats, labels = make_features(rng, num_classes=3)
        state, _ = gmm_fit(feats, labels, num_classes=5)  # classes 3,4 empty
        assert state.means.shape[0] == 3


class TestLogitScorers:
    def test_energy_matches_scipy(self, data, fc_params):
        logits = logits_of(data["valid"], fc_params)
        e = Energy(flip_sign=False)
        e.setup(logits_of(data["train"], fc_params))
        np.testing.assert_allclose(
            e.postprocess(logits), scipy.special.logsumexp(logits, axis=1),
            rtol=1e-5, atol=1e-5,
        )

    def test_msp_matches_scipy(self, data, fc_params):
        logits = logits_of(data["valid"], fc_params)
        m = MSP(flip_sign=False)
        m.setup(logits_of(data["train"], fc_params))
        expected = np.max(scipy.special.softmax(logits, axis=1), axis=1)
        np.testing.assert_allclose(m.postprocess(logits), expected, rtol=1e-5, atol=1e-6)

    def test_gen_matches_reference_definition(self, data, fc_params):
        logits = logits_of(data["valid"], fc_params)
        g = GEN(flip_sign=False, gamma=0.1, num_classes=4)
        g.setup(logits_of(data["train"], fc_params))
        probs = scipy.special.softmax(logits, axis=1)
        probs_sorted = np.sort(probs, axis=1)[:, -4:]
        expected = -np.sum(probs_sorted**0.1 * (1 - probs_sorted) ** 0.1, axis=1)
        np.testing.assert_allclose(g.postprocess(logits), expected, rtol=1e-4, atol=1e-5)

    def test_flip_sign(self, data, fc_params):
        logits = logits_of(data["valid"], fc_params)
        e1 = Energy(flip_sign=False)
        e1.setup(logits_of(data["train"], fc_params))
        e2 = Energy(flip_sign=True)
        e2.setup(logits_of(data["train"], fc_params))
        np.testing.assert_allclose(e2.postprocess(logits), -e1.postprocess(logits))

    def test_threshold_rule(self, data, fc_params):
        e = Energy(flip_sign=False)
        train_logits = logits_of(data["train"], fc_params)
        e.setup(train_logits)
        s = scipy.special.logsumexp(train_logits, axis=1)
        assert e.threshold == pytest.approx(s.mean() - 1.645 * s.std(), rel=1e-5)

    def test_postprocess_before_setup_raises(self, data, fc_params):
        e = Energy(flip_sign=False)
        with pytest.raises(AssertionError):
            e.postprocess(logits_of(data["valid"], fc_params))


class TestMahalanobis:
    def test_matches_reference_definition(self, data):
        m = Mahalanobis(flip_sign=False, num_classes=4)
        m.setup(
            data["train"], train_labels=data["train_labels"], valid_feats=data["valid"]
        )
        ours = m.postprocess(data["ood"])

        class_means, centered = [], []
        for c in range(4):
            cls_samples = data["train"][data["train_labels"] == c]
            class_means.append(cls_samples.mean(0))
            centered.append(cls_samples - class_means[c][None])
        ec = EmpiricalCovariance(assume_centered=False).fit(
            np.concatenate(centered).astype(np.float32)
        )
        expected = []
        for feat in data["ood"]:
            scores_c = [
                -(feat - class_means[c]) @ ec.precision_ @ (feat - class_means[c])
                for c in range(4)
            ]
            expected.append(max(scores_c))
        np.testing.assert_allclose(ours, np.array(expected), rtol=1e-3, atol=1e-2)


class TestASH:
    def test_ash_s_matches_reference_definition(self, rng):
        x = np.abs(rng.randn(8, 32)).astype(np.float32)
        ours = np.asarray(ash_s_linear_layer(x, 85))

        # Reference numpy definition (funcs.py:230-261)
        s1 = x.sum(axis=1)
        n = x.shape[1]
        k = n - int(np.round(n * 85 / 100.0))
        idx = np.argpartition(x, -k)[:, -k:]
        top_k = np.partition(x, -k)[:, -k:]
        scattered = np.zeros_like(x)
        np.put_along_axis(scattered, indices=idx, values=top_k, axis=1)
        s2 = scattered.sum(axis=1)
        expected = scattered * np.exp(s1 / s2)[:, None]
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)

    def test_ash_detector(self, data, fc_params):
        a = ASH(flip_sign=False, ash_percentile=85)
        a.setup(
            data["train"], valid_feats=data["valid"], final_linear_layer_params=fc_params
        )
        scores = a.postprocess(data["valid"])
        assert scores.shape == (100,)
        assert np.isfinite(scores).all()


class TestDICEReAct:
    def test_dice_matches_reference_definition(self, data, fc_params):
        dice = DICE(flip_sign=False, dice_percentile=90, num_classes=4)
        dice.setup(
            data["train"], valid_feats=data["valid"], final_linear_layer_params=fc_params
        )
        ours = dice.postprocess(data["ood"])

        info = data["train"].mean(0)
        contrib = info[None, :] * fc_params["weight"]
        thresh = np.percentile(contrib, 90)
        masked_w = fc_params["weight"] * (contrib > thresh)
        logits = data["ood"] @ masked_w.T + fc_params["bias"]
        expected = scipy.special.logsumexp(logits, axis=1)
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)

    def test_react_matches_reference_definition(self, data, fc_params):
        r = ReAct(flip_sign=False, react_percentile=90)
        r.setup(
            data["train"], valid_feats=data["valid"], final_linear_layer_params=fc_params
        )
        ours = r.postprocess(data["ood"])
        thr = np.percentile(data["train"].flatten(), 90)
        logits = data["ood"].clip(max=thr) @ fc_params["weight"].T + fc_params["bias"]
        expected = scipy.special.logsumexp(logits, axis=1)
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)

    def test_dice_react(self, data, fc_params):
        dr = DICEReAct(flip_sign=False, num_classes=4)
        dr.setup(
            data["train"], valid_feats=data["valid"], final_linear_layer_params=fc_params
        )
        ours = dr.postprocess(data["ood"])
        thr = np.percentile(data["train"].flatten(), 90)
        info = data["train"].mean(0)
        contrib = info[None, :] * fc_params["weight"]
        masked_w = fc_params["weight"] * (contrib > np.percentile(contrib, 90))
        logits = data["ood"].clip(max=thr) @ masked_w.T + fc_params["bias"]
        expected = scipy.special.logsumexp(logits, axis=1)
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


class TestViM:
    def test_matches_reference_definition(self, data, fc_params):
        v = ViM(flip_sign=False)
        train_logits = logits_of(data["train"], fc_params)
        valid_logits = logits_of(data["valid"], fc_params)
        ood_logits = logits_of(data["ood"], fc_params)
        v.setup(
            data["train"],
            train_logits=train_logits,
            valid_feats=data["valid"],
            valid_logits=valid_logits,
            final_linear_layer_params=fc_params,
        )
        ours = v.postprocess(data["ood"], logits=ood_logits)

        # Reference definition (postprocessors.py:1048-1112)
        w, b = fc_params["weight"], fc_params["bias"]
        u = -np.linalg.pinv(w) @ b
        d = data["train"].shape[-1]
        DIM = d // 2
        ec = EmpiricalCovariance(assume_centered=True).fit(data["train"] - u)
        eig_vals, eigen_vectors = np.linalg.eig(ec.covariance_)
        NS = np.ascontiguousarray(
            (eigen_vectors.T[np.argsort(eig_vals * -1)[DIM:]]).T
        )
        vlogit_train = np.linalg.norm((data["train"] - u) @ NS, axis=-1)
        alpha = train_logits.max(axis=-1).mean() / vlogit_train.mean()
        vlogit_ood = np.linalg.norm((data["ood"] - u) @ NS, axis=-1) * alpha
        expected = -vlogit_ood + scipy.special.logsumexp(ood_logits, axis=-1)
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-2)


class TestFeatureKNNAndDDU:
    def test_knn_features(self, data):
        k = KNN(flip_sign=False, k_neighbors=5)
        k.setup(data["train"], valid_feats=data["valid"])
        ours = k.postprocess(data["ood"])

        def norm(x):
            return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)

        tr, te = norm(data["train"]), norm(data["ood"])
        d2 = ((te[:, None, :] - tr[None, :, :]) ** 2).sum(-1)
        expected = -np.sort(d2, axis=1)[:, 4]
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-5)

    def test_ddu(self, data):
        ddu = DDU(flip_sign=False, num_classes=4)
        ddu.setup(
            data["train"], train_labels=data["train_labels"], valid_feats=data["valid"]
        )
        scores_ind = ddu.postprocess(data["valid"])
        scores_ood = ddu.postprocess(data["ood"])
        # OoD data is shifted: its density must be lower on average.
        assert scores_ood.mean() < scores_ind.mean()


class TestPredictiveUncertainty:
    def test_matches_reference_definition(self, rng):
        torch = pytest.importorskip("torch")
        logits = rng.randn(40, 6).astype(np.float32)  # 10 images x 4 MC samples
        pred_h, mi = get_predictive_uncertainty_score(logits, 4)

        t = torch.from_numpy(logits)
        sm = torch.nn.Softmax(dim=1)(t)
        stacked = torch.stack(torch.split(sm, 4))
        expect = stacked.mean(dim=1)
        pred_h_t = -torch.sum(expect * torch.log(expect), dim=1)
        per_h = -torch.sum(stacked * torch.log(stacked), dim=-1)
        mi_t = pred_h_t - per_h.mean(dim=1)
        np.testing.assert_allclose(np.asarray(pred_h), pred_h_t.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mi), mi_t.numpy(), rtol=1e-3, atol=1e-5)
