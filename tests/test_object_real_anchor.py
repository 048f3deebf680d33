"""Trained-weights anchor for the OBJECT-LEVEL flow (VERDICT r2 item 7).

The image-level real-data anchor (test_real_data_anchor.py) proves the
entropy pipeline on trained weights; this file does the same for the
per-detection flow the reference exercises with detectron2/ultralytics
checkpoints (reference runia_core/evaluation/open_set.py:1044-1135): a
classifier trained in-repo on REAL scanned digits (sklearn load_digits),
digit tiles composited onto canvases with exactly known boxes, per-detection
ROI features through the fused batched scorer, and OSOD evaluation.

Open-set protocol:
  - known classes: digits 0-4 (the detector's training world);
  - unseen-class objects: digits 5-9 on the same canvases (the open-set
    shift — same sensor, novel semantics);
  - cross-dataset objects: real photo patches as tiles (the far-OoD shift).

Gates: the trained per-detection Mahalanobis must rank known-class objects
above unseen-class objects (AUROC > 0.7 — same-domain open-set is the hard
case) and far above photo-patch objects (AUROC > 0.95), and the fused
build_object_scorer program must agree with the plain feature path.
"""

import json

import numpy as np
import pytest
from sklearn.datasets import load_digits, load_sample_images
from sklearn.metrics import roc_auc_score

import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.evaluation.open_set import OpenSetEvaluator
from runia_core_tpu.extraction.object_level_batched import (
    batched_roi_features,
    build_object_scorer,
    pad_detections,
)
from runia_core_tpu.models import SimpleConvNet, build_tapped_forward
from runia_core_tpu.training import fit_classifier

SEED = 7
TILE = 16
CANVAS = 48
KNOWN = (0, 1, 2, 3, 4)
SLOTS = ((4, 4), (28, 28), (4, 28))  # (row, col) tile corners, non-overlapping


def _tile_pools():
    """Real 16x16 digit tiles split by class group, plus real photo patches."""
    d = load_digits()
    tiles = np.kron(d.images / 16.0, np.ones((2, 2))).astype(np.float32)[..., None]
    labels = d.target
    rng = np.random.RandomState(SEED)
    perm = rng.permutation(len(tiles))
    tiles, labels = tiles[perm], labels[perm]

    known = np.isin(labels, KNOWN)
    x_known, y_known = tiles[known], labels[known]
    n_tr = int(0.7 * len(x_known))

    patches = []
    for photo in load_sample_images().images:
        gray = photo.mean(-1).astype(np.float32) / 255.0
        for i in range(0, gray.shape[0] - TILE, 40):
            for j in range(0, gray.shape[1] - TILE, 40):
                patches.append(gray[i : i + TILE, j : j + TILE])
    x_photo = np.stack(patches)[..., None].astype(np.float32)

    return (
        (x_known[:n_tr], y_known[:n_tr]),
        (x_known[n_tr:], y_known[n_tr:]),
        tiles[~known],
        x_photo,
    )


def _make_canvases(tile_pool, rng, n_canvas, tile_labels=None):
    """Composite 3 tiles per canvas at the fixed slots; boxes are exact."""
    k = len(SLOTS)
    canvases = np.zeros((n_canvas, CANVAS, CANVAS, 1), np.float32)
    boxes = np.zeros((n_canvas, k, 4), np.float32)
    labels = np.zeros((n_canvas, k), np.int64)
    idx = rng.randint(0, len(tile_pool), size=(n_canvas, k))
    for i in range(n_canvas):
        for s, (r, c) in enumerate(SLOTS):
            canvases[i, r : r + TILE, c : c + TILE] = tile_pool[idx[i, s]]
            boxes[i, s] = [c, r, c + TILE, r + TILE]
            if tile_labels is not None:
                labels[i, s] = tile_labels[idx[i, s]]
    return canvases, boxes, labels


@pytest.fixture(scope="module")
def trained_object_anchor():
    (x_tr, y_tr), (x_te, y_te), x_unseen, x_photo = _tile_pools()
    model = SimpleConvNet(num_classes=len(KNOWN), features=8)
    remap = {c: i for i, c in enumerate(KNOWN)}
    y_tr_m = np.array([remap[c] for c in y_tr])
    batches = [
        (x_tr[i : i + 64], y_tr_m[i : i + 64]) for i in range(0, len(x_tr), 64)
    ]
    variables, _ = fit_classifier(
        model, batches, jax.random.key(SEED), jnp.asarray(x_tr[:2]),
        epochs=60, learning_rate=5e-3,
    )
    forward = build_tapped_forward(model, variables)
    logits, _ = forward(jnp.asarray(x_te))
    acc = float(
        (np.argmax(np.asarray(logits), -1) == [remap[c] for c in y_te]).mean()
    )
    assert acc > 0.9, f"tile classifier failed to generalize: acc={acc:.3f}"
    return forward, (x_tr, y_tr), (x_te, y_te), x_unseen, x_photo


def _box_features(forward, canvases, boxes):
    _, taps = forward(jnp.asarray(canvases))
    fmaps = (jnp.transpose(taps["pre_pool"], (0, 3, 1, 2)),)
    f = batched_roi_features(
        fmaps, jnp.asarray(boxes), (CANVAS, CANVAS), (4,)
    )
    return np.asarray(f).reshape(-1, f.shape[-1])


@pytest.fixture(scope="module")
def object_scores(trained_object_anchor):
    forward, (x_tr, _), (x_te, _), x_unseen, x_photo = trained_object_anchor
    rng = np.random.RandomState(1)
    cv_tr, bx_tr, _ = _make_canvases(x_tr, rng, 80)
    cv_te, bx_te, _ = _make_canvases(x_te, rng, 40)
    cv_un, bx_un, _ = _make_canvases(x_unseen, rng, 40)
    cv_ph, bx_ph, _ = _make_canvases(x_photo, rng, 40)

    md = MDLatentSpace()
    md.setup(_box_features(forward, cv_tr, bx_tr))
    score = lambda cv, bx: np.asarray(
        md.postprocess(_box_features(forward, cv, bx))
    )
    return {
        "md": md,
        "forward": forward,
        "canvases": {"te": (cv_te, bx_te), "un": (cv_un, bx_un),
                     "ph": (cv_ph, bx_ph)},
        "s_te": score(cv_te, bx_te),
        "s_un": score(cv_un, bx_un),
        "s_ph": score(cv_ph, bx_ph),
    }


class TestTrainedObjectAnchor:
    def test_per_detection_scores_separate_real_objects(self, object_scores):
        s_te, s_un, s_ph = (
            object_scores["s_te"], object_scores["s_un"], object_scores["s_ph"]
        )
        a_unseen = roc_auc_score(
            np.r_[np.ones(len(s_te)), np.zeros(len(s_un))], np.r_[s_te, s_un]
        )
        a_photo = roc_auc_score(
            np.r_[np.ones(len(s_te)), np.zeros(len(s_ph))], np.r_[s_te, s_ph]
        )
        # Same-domain open-set (novel digit classes) is the hard case;
        # cross-dataset objects must be near-perfectly separated.
        assert a_unseen > 0.7, f"unseen-class object AUROC: {a_unseen:.4f}"
        assert a_photo > 0.95, f"photo-patch object AUROC: {a_photo:.4f}"

    def test_fused_scorer_matches_feature_path(self, object_scores):
        """build_object_scorer (one jitted program) == ROI features + MD."""
        forward, md = object_scores["forward"], object_scores["md"]
        cv_te, bx_te = object_scores["canvases"]["te"]
        k = bx_te.shape[1]

        dets = [{"boxes": bx_te[i]} for i in range(len(bx_te))]
        padded = pad_detections(dets, k, (CANVAS, CANVAS))
        scorer = build_object_scorer(
            forward, md.state, output_sizes=(4,), img_shape=(CANVAS, CANVAS)
        )
        fused = np.asarray(scorer(jnp.asarray(cv_te), padded)).reshape(-1)
        np.testing.assert_allclose(
            fused, object_scores["s_te"], rtol=1e-3, atol=1e-3
        )

    def test_osod_eval_on_trained_scores(self, object_scores, tmp_path):
        """OpenSetEvaluator over the real trained per-detection flow: the
        known split must reach high mAP (exact boxes + ~99% classifier) and
        every unseen-class detection labeled known must count into AOSE."""
        forward = object_scores["forward"]

        def coco_for(ids, boxes_per, classes_per, categories):
            return {
                "images": [
                    {"id": i, "file_name": f"{i}.jpg", "width": CANVAS,
                     "height": CANVAS} for i in ids
                ],
                "annotations": [
                    {"id": k, "image_id": im, "category_id": int(c),
                     "bbox": [float(b[0]), float(b[1]),
                              float(b[2] - b[0]), float(b[3] - b[1])],
                     "area": float((b[2] - b[0]) * (b[3] - b[1]))}
                    for k, (im, b, c) in enumerate(
                        (im, b, c)
                        for im, bxs, cls in zip(ids, boxes_per, classes_per)
                        for b, c in zip(bxs, cls)
                    )
                ],
                "categories": [{"id": c, "name": n} for c, n in categories],
            }

        # Rebuild small eval canvases with labels for the GT files.
        _, (x_te, y_te), x_unseen, _ = _tile_pools()
        rng = np.random.RandomState(2)
        remap = {c: i for i, c in enumerate(KNOWN)}
        cv_te, bx_te, lb_te = _make_canvases(
            x_te, rng, 12, tile_labels=np.array([remap[c] for c in y_te])
        )
        cv_un, bx_un, _ = _make_canvases(x_unseen, rng, 12)

        ind_ids = list(range(1, len(cv_te) + 1))
        ood_ids = list(range(100, 100 + len(cv_un)))
        ind_gt = coco_for(
            ind_ids, bx_te, lb_te,
            [(remap[c], f"digit{c}") for c in KNOWN],
        )
        ood_gt = coco_for(
            ood_ids, bx_un, np.zeros_like(bx_un[..., 0], np.int64),
            [(0, "unknown")],
        )
        ind_path, ood_path = tmp_path / "ind.json", tmp_path / "ood.json"
        ind_path.write_text(json.dumps(ind_gt))
        ood_path.write_text(json.dumps(ood_gt))

        md = object_scores["md"]

        def detections_for(canvases, boxes):
            """Per-box predictions from the trained model: crop logits +
            per-detection MD method scores."""
            feats = _box_features(forward, canvases, boxes)
            scores_md = np.asarray(md.postprocess(feats))
            out = []
            i = 0
            for b_i, bxs in enumerate(boxes):
                crops = np.stack([
                    canvases[b_i, int(b[1]):int(b[3]), int(b[0]):int(b[2])]
                    for b in bxs
                ])
                logits, _ = forward(jnp.asarray(crops))
                logits = np.asarray(logits)
                sm = np.exp(logits - logits.max(-1, keepdims=True))
                sm = sm / sm.sum(-1, keepdims=True)
                out.append({
                    "boxes": bxs,
                    "classes": logits.argmax(-1),
                    "softmax": sm.max(-1),
                    "method": scores_md[i : i + len(bxs)],
                })
                i += len(bxs)
            return out

        ind_dets = detections_for(cv_te, bx_te)
        ood_dets = detections_for(cv_un, bx_un)

        ev = OpenSetEvaluator("ind", str(ind_path), metric_2007=False)
        ev.reset()
        for im_id, det in zip(ind_ids, ind_dets):
            ev.process(image_id=im_id, boxes=det["boxes"],
                       softmax_scores=det["softmax"],
                       method_scores=det["method"], classes=det["classes"])
        ind_res = ev.evaluate(str(ind_path), is_ood=False,
                              get_known_classes_metrics=True)
        assert ind_res["mAP"] > 0.9, ind_res

        ev = OpenSetEvaluator("ind", str(ind_path), metric_2007=False)
        ev.reset()
        for im_id, det in zip(ood_ids, ood_dets):
            ev.process(image_id=im_id, boxes=det["boxes"],
                       softmax_scores=det["softmax"],
                       method_scores=det["method"], classes=det["classes"])
        ood_res = ev.evaluate(str(ood_path), is_ood=True,
                              get_known_classes_metrics=False)
        # Every unseen-class object is predicted as SOME known class (the
        # classifier has no reject option), so AOSE counts all of them.
        assert ood_res["AOSE"] == len(ood_ids) * len(SLOTS), ood_res
