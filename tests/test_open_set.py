"""Open-set detection evaluation tests against temp-file COCO JSON fixtures
(mirrors the reference's unit_test_open_set.py setUp strategy)."""

import json

import numpy as np
import pytest

from runia_core_tpu.evaluation import open_set
from runia_core_tpu.evaluation.open_set import (
    COCOParser,
    OpenSetEvaluator,
    convert_osod_results_for_mlflow_logging,
    convert_osod_results_to_pandas_df,
    convert_xywh_to_xyxy,
    evaluate_open_set_detection_one_method,
    get_boxes_gtu_and_uu_ood_dataset,
    get_labels_and_scores_from_logits,
    get_n_unk_ood_dataset,
    get_overall_open_set_results,
    voc_ap,
    voc_eval,
)


def make_coco(path, images, annotations, categories):
    coco = {
        "images": [{"id": i, "file_name": f"{i}.jpg", "width": 100, "height": 100}
                   for i in images],
        "annotations": [
            {"id": k, "image_id": im, "category_id": cat, "bbox": bbox, "area": bbox[2] * bbox[3]}
            for k, (im, cat, bbox) in enumerate(annotations)
        ],
        "categories": [{"id": c, "name": n} for c, n in categories],
    }
    path.write_text(json.dumps(coco))
    return str(path)


@pytest.fixture
def ind_gt(tmp_path):
    # 2 categories, 2 images, 3 objects
    return make_coco(
        tmp_path / "ind.json",
        images=[1, 2],
        annotations=[
            (1, 0, [10, 10, 30, 30]),
            (1, 1, [50, 50, 20, 20]),
            (2, 0, [20, 20, 40, 40]),
        ],
        categories=[(0, "car"), (1, "person")],
    )


@pytest.fixture
def ood_gt(tmp_path):
    # OoD dataset: all objects are unknown by definition
    return make_coco(
        tmp_path / "ood.json",
        images=[10, 11],
        annotations=[
            (10, 0, [10, 10, 30, 30]),
            (11, 0, [5, 5, 50, 50]),
        ],
        categories=[(0, "whatever")],
    )


class TestCOCOParser:
    def test_parse(self, ind_gt):
        parser = COCOParser(ind_gt)
        assert parser.get_imgIds() == [1, 2]
        assert len(parser.get_annIds([1])) == 2
        assert parser.cat_dict[0]["count"] == 2
        assert parser.load_cats(0)[0]["name"] == "car"
        assert parser.get_img_ids_per_cat_name("car") == [1, 2]

    def test_subset(self, ind_gt):
        parser = COCOParser(ind_gt, using_subset=[1])
        assert parser.get_imgIds() == [1]
        assert len(parser.get_annIds([1])) == 2

    def test_xywh_to_xyxy(self):
        assert convert_xywh_to_xyxy([10, 20, 30, 40]) == [10, 20, 40, 60]


class TestVocAp:
    def test_perfect_detector(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 1.0])
        assert voc_ap(rec, prec, use_07_metric=False) == pytest.approx(1.0)

    def test_07_metric(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 0.5])
        ap07 = voc_ap(rec, prec, use_07_metric=True)
        # 11 points: recall>=0..0.5 -> max prec 1.0 (6 pts), >0.5 -> 0.5 (5 pts)
        assert ap07 == pytest.approx((6 * 1.0 + 5 * 0.5) / 11)

    def test_envelope(self):
        rec = np.array([0.25, 0.5, 0.75, 1.0])
        prec = np.array([1.0, 0.5, 0.75, 0.6])
        ap = voc_ap(rec, prec, use_07_metric=False)
        # envelope: [1.0, 0.75, 0.75, 0.6] at the four recall steps
        assert ap == pytest.approx(0.25 * (1.0 + 0.75 + 0.75 + 0.6))


class TestVocEval:
    def test_perfect_predictions(self, ind_gt):
        parser = COCOParser(ind_gt)
        # predictions exactly on GT boxes for class "car" (+1 offset convention)
        lines = [
            "1 0.900 11.0 11.0 40.0 40.0 0.500",
            "2 0.800 21.0 21.0 60.0 60.0 0.400",
        ]
        rec, prec, ap, unk_sum, n_unk, tpfp, fpos = voc_eval(
            lines, parser, "car", ovthresh=0.5, use_07_metric=False, is_ood=False
        )
        assert rec[-1] == pytest.approx(1.0)
        assert prec[-1] == pytest.approx(1.0)
        assert ap == pytest.approx(1.0)

    def test_wrong_location_fp(self, ind_gt):
        parser = COCOParser(ind_gt)
        lines = ["1 0.900 80.0 80.0 95.0 95.0 0.500"]
        rec, prec, ap, *_ = voc_eval(
            lines, parser, "car", ovthresh=0.5, use_07_metric=False, is_ood=False
        )
        assert ap == 0.0

    def test_ood_unknown_class(self, ood_gt):
        parser = COCOParser(ood_gt)
        # both ood GT boxes detected as "unknown" (with +1 offset)
        lines = [
            "10 0.900 11.0 11.0 40.0 40.0 0.100",
            "11 0.800 6.0 6.0 55.0 55.0 0.200",
        ]
        rec, prec, ap, unk_sum, n_unk, tpfp, fpos = voc_eval(
            lines, parser, "unknown", ovthresh=0.5, use_07_metric=False, is_ood=True
        )
        assert n_unk == 2
        assert ap == pytest.approx(1.0)


class TestOpenSetEvaluator:
    def test_known_classes_from_ind(self, ind_gt):
        ev = OpenSetEvaluator("ind", ind_gt, metric_2007=False)
        assert ev.num_known_classes == 2
        assert ev.unknown_class_index == 2
        assert ev._class_names == ["car", "person", "unknown"]

    def test_evaluate_ind_perfect(self, ind_gt):
        ev = OpenSetEvaluator("ind", ind_gt, metric_2007=False)
        ev.reset()
        ev.process(
            image_id=1,
            boxes=np.array([[10, 10, 40, 40], [50, 50, 70, 70]], float),
            softmax_scores=np.array([0.9, 0.85]),
            method_scores=np.array([5.0, 4.0]),
            classes=np.array([0, 1]),
        )
        ev.process(
            image_id=2,
            boxes=np.array([[20, 20, 60, 60]], float),
            softmax_scores=np.array([0.8]),
            method_scores=np.array([4.5]),
            classes=np.array([0]),
        )
        results = ev.evaluate(ind_gt, is_ood=False, get_known_classes_metrics=True)
        # mAP averages over known classes AND the (empty) unknown class row,
        # matching the reference (open_set.py:387): (100 + 100 + 0) / 3.
        assert results["mAP"] == pytest.approx(200.0 / 3, abs=1e-2)
        assert results["AP_K"] == pytest.approx(100.0)
        assert results["AOSE"] == 0
        assert results["R_K"] == pytest.approx(100.0)

    def test_evaluate_ood_aose(self, ind_gt, ood_gt):
        """Detections on OoD objects classified as known count toward AOSE."""
        ev = OpenSetEvaluator("ind", ind_gt, metric_2007=False)
        ev.reset()
        # Both OoD GT objects detected but labeled as class 0 (known) ->
        # AOSE = 2, nOSE = 100%
        ev.process(
            image_id=10,
            boxes=np.array([[10, 10, 40, 40]], float),
            softmax_scores=np.array([0.9]),
            method_scores=np.array([5.0]),
            classes=np.array([0]),
        )
        ev.process(
            image_id=11,
            boxes=np.array([[5, 5, 55, 55]], float),
            softmax_scores=np.array([0.8]),
            method_scores=np.array([5.0]),
            classes=np.array([0]),
        )
        results = ev.evaluate(ood_gt, is_ood=True, get_known_classes_metrics=False)
        assert results["AOSE"] == 2
        assert results["nOSE"] == pytest.approx(100.0)
        assert results["R_U"] == 0.0  # nothing labeled unknown

    def test_evaluate_ood_unknown_recall(self, ind_gt, ood_gt):
        ev = OpenSetEvaluator("ind", ind_gt, metric_2007=False)
        ev.reset()
        for im, box in ((10, [10, 10, 40, 40]), (11, [5, 5, 55, 55])):
            ev.process(
                image_id=im,
                boxes=np.array([box], float),
                softmax_scores=np.array([0.9]),
                method_scores=np.array([-5.0]),
                classes=np.array([2]),  # unknown index
            )
        results = ev.evaluate(ood_gt, is_ood=True, get_known_classes_metrics=False)
        assert results["AOSE"] == 0
        assert results["R_U"] == pytest.approx(100.0)
        assert results["AP_U"] == pytest.approx(100.0)


class TestEndToEndOSOD:
    def make_predictions(self, scores):
        """Prediction dicts in the extractor's output format."""
        return {
            10: {
                "boxes": np.array([[10, 10, 40, 40]], float),
                "logits": np.array([[2.0, 0.1]]),
                "md": [scores[0]],
            },
            11: {
                "boxes": np.array([[5, 5, 55, 55]], float),
                "logits": np.array([[0.1, 2.0]]),
                "md": [scores[1]],
            },
        }

    def test_evaluate_one_method_thresholding(self, ind_gt, ood_gt):
        # Scores below threshold -> relabeled unknown -> AOSE 0
        preds = self.make_predictions([-10.0, -12.0])
        results = evaluate_open_set_detection_one_method(
            id_dataset_name="ind",
            id_gt_annotations_path=ind_gt,
            predictions_dict=preds,
            method_name="md",
            threshold=0.0,
            test_gt_annotations_path=ood_gt,
            metric_2007=False,
            evaluating_ood=True,
            get_known_classes_metrics=False,
            is_open_set_model=False,
        )
        assert results["AOSE"] == 0
        assert results["R_U"] == pytest.approx(100.0)

        # Scores above threshold -> kept known -> AOSE 2
        preds = self.make_predictions([10.0, 12.0])
        results = evaluate_open_set_detection_one_method(
            id_dataset_name="ind",
            id_gt_annotations_path=ind_gt,
            predictions_dict=preds,
            method_name="md",
            threshold=0.0,
            test_gt_annotations_path=ood_gt,
            metric_2007=False,
            evaluating_ood=True,
            get_known_classes_metrics=False,
            is_open_set_model=False,
        )
        assert results["AOSE"] == 2

    def test_gtu_uu_split(self, ind_gt, ood_gt):
        preds = self.make_predictions([1.5, 2.5])
        # Add a detection overlapping nothing -> UU
        preds[10]["boxes"] = np.vstack([preds[10]["boxes"], [[70, 70, 95, 95]]])
        preds[10]["logits"] = np.vstack([preds[10]["logits"], [[3.0, 0.0]]])
        preds[10]["md"] = [1.5, 9.9]
        gtu, uu = get_boxes_gtu_and_uu_ood_dataset(
            id_dataset_name="ind",
            id_gt_annotations_path=ind_gt,
            predictions_dict=preds,
            method_name="md",
            test_gt_annotations_path=ood_gt,
            metric_2007=False,
            evaluating_ood=True,
        )
        assert sorted(gtu.tolist()) == [1.5, 2.5]
        assert uu.tolist() == [9.9]

    def test_overall_and_converters(self, ind_gt, ood_gt):
        preds = self.make_predictions([-10.0, 12.0])
        results = get_overall_open_set_results(
            ind_dataset_name="ind",
            ind_gt_annotations_path=ind_gt,
            ind_data_dict={"valid": {}},
            ood_data_dict={"oodset": preds},
            ood_datasets_names=["oodset"],
            ood_annotations_paths={"oodset": ood_gt},
            methods_names=["md"],
            methods_thresholds={"md": 0.0},
            metric_2007=False,
            evaluate_on_ind=False,
            get_known_classes_metrics=False,
            is_open_set_model=False,
        )
        assert "oodset" in results and "md" in results["oodset"]
        assert results["oodset"]["md"]["AOSE"] == 1  # one above threshold

        flat = convert_osod_results_for_mlflow_logging(results, ["oodset"], ["md"])
        assert "oodset md AOSE" in flat
        df = convert_osod_results_to_pandas_df(
            results["oodset"], ["md"], save_method_as_data=False
        )
        assert "AOSE" in df.columns

        # Hierarchical two-dataset dataframe + the bar-chart plotters
        import matplotlib

        matplotlib.use("Agg")
        from runia_core_tpu.evaluation.open_set import (
            convert_osod_results_to_hierarchical_pandas_df,
            plot_two_osod_datasets_metrics,
            plot_two_osod_datasets_per_metric,
        )

        # save_method_as_data=False is the working configuration; True has a
        # column-count mismatch in the reference too (its columns grow by one
        # per dataset but the row only gains one Method cell) — preserved
        # bug-for-bug (reference open_set.py:1509-1527).
        hier = convert_osod_results_to_hierarchical_pandas_df(
            results["oodset"], results["oodset"], ["md"],
            save_method_as_data=False, datasets_names=["a", "b"],
        )
        assert ("a", "AOSE") in hier.columns and ("b", "AOSE") in hier.columns
        with pytest.raises(Exception):
            convert_osod_results_to_hierarchical_pandas_df(
                results["oodset"], results["oodset"], ["md"],
                save_method_as_data=True, datasets_names=["a", "b"],
            )
        numeric_cols = [c for c in df.columns
                        if np.issubdtype(np.asarray(df[c]).dtype, np.number)]
        metric = numeric_cols[0]
        plot_two_osod_datasets_metrics(
            df, df, ["md"], ["a", "b"],
            metrics_to_plot=[metric], show_plot=False,
        )
        plot_two_osod_datasets_per_metric(
            df, df, ["md"], ["a", "b"],
            metric_to_plot=metric, show_plot=False,
        )

    def test_labels_and_scores_from_logits_strip(self):
        logits = np.random.RandomState(0).randn(5, 21)
        labels, scores = get_labels_and_scores_from_logits(logits)
        assert labels.max() < 20
        assert (scores <= 1.0).all()

    def test_n_unk(self, ood_gt):
        assert get_n_unk_ood_dataset(ood_gt) == 2


class TestNativeOsodParity:
    """The C++ greedy-match kernels (native/osod_eval.cpp) must be
    bit-identical to the Python loops they replace."""

    @staticmethod
    def _random_problem(seed, nd=400, n_img=25, max_gt=6):
        rng = np.random.RandomState(seed)
        img_keys = [f"im{i}" for i in range(n_img)]
        recs = {}
        for k in img_keys:
            n = rng.randint(0, max_gt + 1)
            if n:
                xy = rng.uniform(0, 80, (n, 2))
                wh = rng.uniform(4, 40, (n, 2))
                box = np.concatenate([xy, xy + wh], axis=1)
            else:
                box = np.array([])
            recs[k] = {
                "bbox": box,
                "difficult": rng.rand(n) < 0.15,
                "det": [False] * n,
            }
        # some detections reference images absent from the records
        image_ids = [
            img_keys[rng.randint(n_img)] if rng.rand() > 0.05 else "missing"
            for _ in range(nd)
        ]
        xy = rng.uniform(0, 80, (nd, 2))
        wh = rng.uniform(4, 40, (nd, 2))
        bb = np.concatenate([xy, xy + wh], axis=1)
        return image_ids, bb, recs

    @pytest.mark.skipif(
        not open_set.HAVE_NATIVE_OSOD, reason="native extension not built"
    )
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_greedy_match_parity(self, seed, monkeypatch):
        image_ids, bb, recs = self._random_problem(seed)
        import copy

        npos = int(sum((~r["difficult"]).sum() for r in recs.values()))
        got = open_set._greedy_match(
            image_ids, bb, copy.deepcopy(recs), 0.35, npos, False
        )
        monkeypatch.setattr(open_set, "HAVE_NATIVE_OSOD", False)
        want = open_set._greedy_match(image_ids, bb, recs, 0.35, npos, False)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    @pytest.mark.skipif(
        not open_set.HAVE_NATIVE_OSOD, reason="native extension not built"
    )
    @pytest.mark.parametrize("seed", [3, 4])
    def test_mark_unknown_parity(self, seed, monkeypatch):
        image_ids, bb, recs = self._random_problem(seed, nd=300)
        nd = len(image_ids)
        got = open_set._mark_unknown_overlaps(nd, image_ids, bb, recs, 0.5)
        monkeypatch.setattr(open_set, "HAVE_NATIVE_OSOD", False)
        want = open_set._mark_unknown_overlaps(nd, image_ids, bb, recs, 0.5)
        assert got[0] == want[0]
        np.testing.assert_array_equal(got[1], want[1])
        np.testing.assert_array_equal(got[2], want[2])

    def test_empty_detections(self):
        _, _, recs = self._random_problem(7)
        nd, rec, prec, ap, tp, fp = open_set._greedy_match(
            [], np.empty((0, 4)), recs, 0.5, 10, False
        )
        assert nd == 0 and ap == 0.0
