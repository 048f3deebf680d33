"""Edge cases: degenerate ROC inputs, OSOD image subsets, empty detections."""

import json

import numpy as np
import pytest

from runia_core_tpu.evaluation.metrics import binary_roc, get_auroc_results
from runia_core_tpu.evaluation.open_set import (
    COCOParser,
    evaluate_open_set_detection_one_method,
)


class TestROCEdges:
    def test_single_sample_each(self):
        table = get_auroc_results("e", np.array([1.0]), np.array([0.0]))
        assert table.loc["e", "auroc"] == pytest.approx(1.0)

    def test_inverted_scores(self, rng):
        ind = rng.randn(100)
        ood = rng.randn(100) + 3.0  # OoD scores higher: AUROC << 0.5
        table = get_auroc_results("e", ind, ood)
        assert table.loc["e", "auroc"] < 0.1

    def test_identical_scores(self):
        fpr, tpr, _ = binary_roc(np.ones(10), np.array([1] * 5 + [0] * 5))
        # One threshold step from (0,0) to (1,1): AUROC 0.5 by trapezoid
        from runia_core_tpu.evaluation.metrics import auc

        assert auc(fpr, tpr) == pytest.approx(0.5)


def make_coco(path, images, annotations, categories):
    coco = {
        "images": [{"id": i, "file_name": f"{i}.jpg", "width": 100, "height": 100}
                   for i in images],
        "annotations": [
            {"id": k, "image_id": im, "category_id": cat, "bbox": bbox,
             "area": bbox[2] * bbox[3]}
            for k, (im, cat, bbox) in enumerate(annotations)
        ],
        "categories": [{"id": c, "name": n} for c, n in categories],
    }
    path.write_text(json.dumps(coco))
    return str(path)


class TestOSODSubsets:
    def test_using_subset_restricts_eval(self, tmp_path, rng):
        ind_gt = make_coco(
            tmp_path / "ind.json", [1],
            [(1, 0, [10, 10, 30, 30])], [(0, "car")],
        )
        ood_gt = make_coco(
            tmp_path / "ood.json", [10, 11],
            [(10, 0, [10, 10, 30, 30]), (11, 0, [5, 5, 50, 50])],
            [(0, "whatever")],
        )
        preds = {
            10: {"boxes": np.array([[10, 10, 40, 40]], float),
                 "logits": np.array([[2.0]]), "md": [5.0]},
            11: {"boxes": np.array([[5, 5, 55, 55]], float),
                 "logits": np.array([[2.0]]), "md": [5.0]},
        }
        full = evaluate_open_set_detection_one_method(
            "ind", ind_gt, preds, "md", threshold=0.0,
            test_gt_annotations_path=ood_gt, metric_2007=False,
            evaluating_ood=True, get_known_classes_metrics=False,
            is_open_set_model=False,
        )
        subset = evaluate_open_set_detection_one_method(
            "ind", ind_gt, preds, "md", threshold=0.0,
            test_gt_annotations_path=ood_gt, metric_2007=False,
            evaluating_ood=True, get_known_classes_metrics=False,
            is_open_set_model=False, using_subset=[10],
        )
        assert full["AOSE"] == 2
        assert subset["AOSE"] == 1  # only image 10 evaluated

    def test_parser_empty_annotations(self, tmp_path):
        path = make_coco(tmp_path / "empty.json", [1], [], [(0, "car")])
        parser = COCOParser(path)
        assert parser.get_annIds([1]) == []
        assert parser.cat_dict[0]["count"] == 0
