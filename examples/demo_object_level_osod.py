"""Object-level OoD + open-set detection (OSOD) demo.

Mock detection adapter -> per-detection ROIAlign features -> baselines
(MSP/energy/LaREM) -> thresholds -> open-set evaluation (mAP / WI / AOSE /
unknown AP-P-R) against COCO-format ground truth. Fully offline; swap the
MockDetector for a real adapted model (see extraction/adapters.py).
"""

import os as _os
import sys as _sys

# Allow `python examples/<demo>.py` from a fresh checkout (the script
# dir, not the cwd, lands on sys.path; installed packages are found).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import tempfile

import numpy as np

from runia_core_tpu.config import default_config
from runia_core_tpu.detectors import MDLatentSpace, get_baselines_thresholds
from runia_core_tpu.evaluation import calculate_all_baselines
from runia_core_tpu.evaluation.open_set import get_overall_open_set_results
from runia_core_tpu.extraction import (
    BoxFeaturesExtractor,
    DetectionResult,
    get_aggregated_data_dict,
)

IMG_H, IMG_W = 64, 96
NUM_CLASSES = 4


class MockDetector:
    def __init__(self, rng, shift=0.0):
        self.rng = rng
        self.shift = shift

    def __call__(self, image, predict_conf, **kwargs):
        n = self.rng.randint(1, 4)
        xy = self.rng.rand(n, 2) * np.array([IMG_W / 2, IMG_H / 2])
        wh = self.rng.rand(n, 2) * 20 + 5
        return DetectionResult(
            boxes=np.concatenate([xy, xy + wh], 1).astype(np.float32),
            img_shape=(IMG_H, IMG_W),
            scores=self.rng.rand(n).astype(np.float32),
            classes=self.rng.randint(0, NUM_CLASSES, n),
            logits=(self.rng.randn(n, NUM_CLASSES) + self.shift).astype(np.float32),
            fmaps=[(self.rng.rand(1, 16, 8, 12) + self.shift).astype(np.float32)],
        )


def write_coco(path, image_ids, rng):
    coco = {
        "images": [{"id": i, "file_name": f"{i}.jpg", "width": IMG_W, "height": IMG_H}
                   for i in image_ids],
        "annotations": [
            {"id": k, "image_id": i, "category_id": int(rng.randint(0, NUM_CLASSES)),
             "bbox": [10, 10, 30, 30], "area": 900}
            for k, i in enumerate(image_ids)
        ],
        "categories": [{"id": c, "name": f"class{c}"} for c in range(NUM_CLASSES)],
    }
    with open(path, "w") as f:
        json.dump(coco, f)
    return path


def main():
    rng = np.random.RandomState(0)
    ind_model = MockDetector(rng)
    ood_model = MockDetector(rng, shift=1.5)

    def extract(model, ids):
        extractor = BoxFeaturesExtractor(
            model=model, architecture="yolov8", roi_output_sizes=[7]
        )
        return extractor.get_ls_samples([(f"{i}.jpg", None, i) for i in ids])

    train_ids, valid_ids, ood_ids = range(0, 20), range(20, 30), range(100, 110)
    data = {"train": extract(ind_model, train_ids),
            "valid": extract(ind_model, valid_ids),
            "ood": extract(ood_model, ood_ids)}

    agg, no_obj, non_empty = {}, {}, {}
    for name in ("train", "valid", "ood"):
        agg, no_obj, non_empty = get_aggregated_data_dict(
            data, name, agg, no_obj, non_empty, probs_as_logits=False
        )

    ind_dict = {
        "train latent_space_means": agg["train latent_space_means"],
        "valid latent_space_means": agg["valid latent_space_means"],
        "train logits": agg["train logits"],
        "valid logits": agg["valid logits"],
        "train features": agg["train latent_space_means"],
        "valid features": agg["valid latent_space_means"],
    }
    ood_dict = {
        "ood latent_space_means": agg["ood latent_space_means"],
        "ood logits": agg["ood logits"],
        "ood features": agg["ood latent_space_means"],
    }
    cfg = default_config(ood_datasets=["ood"], num_classes=NUM_CLASSES, k_neighbors=5)
    ind_dict, ood_dict, baseline_scores = calculate_all_baselines(
        ["msp", "energy"], ind_dict, ood_dict, None, cfg, NUM_CLASSES
    )

    # LaREM on per-detection ROI features
    larem = MDLatentSpace()
    larem.setup(agg["train latent_space_means"])
    ind_dict["md"] = larem.postprocess(agg["valid latent_space_means"])
    baseline_scores["ood md"] = larem.postprocess(agg["ood latent_space_means"])

    thresholds = get_baselines_thresholds(["msp", "energy", "md"], ind_dict)
    print("Thresholds:", thresholds)

    # Attach per-detection scores back onto the per-image dicts for OSOD eval
    from runia_core_tpu.extraction import (
        associate_precalculated_baselines_with_raw_predictions,
    )

    data["ood"] = associate_precalculated_baselines_with_raw_predictions(
        data["ood"], "ood",
        {"ood msp": baseline_scores["ood msp"], "ood md": baseline_scores["ood md"]},
        ["msp", "md"], non_empty["ood"], is_ood=True,
    )

    with tempfile.TemporaryDirectory() as tmp:
        ind_gt = write_coco(f"{tmp}/ind.json", list(valid_ids), rng)
        ood_gt = write_coco(f"{tmp}/ood.json", list(ood_ids), rng)
        results = get_overall_open_set_results(
            ind_dataset_name="synthetic",
            ind_gt_annotations_path=ind_gt,
            ind_data_dict={"valid": {}},
            ood_data_dict={"ood": data["ood"]},
            ood_datasets_names=["ood"],
            ood_annotations_paths={"ood": ood_gt},
            methods_names=["msp", "md"],
            methods_thresholds={"msp": thresholds["msp"], "md": thresholds["md"]},
            metric_2007=False,
            evaluate_on_ind=False,
            get_known_classes_metrics=False,
            is_open_set_model=False,
        )
    print("OSOD results:")
    for method, metrics in results["ood"].items():
        print(f"  {method}: {metrics}")


if __name__ == "__main__":
    main()
