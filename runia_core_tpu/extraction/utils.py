"""Aggregation utilities for object-level extraction results.

numpy equivalents of reference runia_core/feature_extraction/utils.py:127-244
operating on the per-image dicts produced by BoxFeaturesExtractor.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

__all__ = [
    "get_aggregated_data_dict",
    "associate_precalculated_baselines_with_raw_predictions",
]


def get_aggregated_data_dict(
    data_dict: Dict,
    dataset_name: str,
    aggregated_data_dict: Dict[str, np.ndarray],
    no_obj_dict: Dict[str, List],
    non_empty_predictions_ids: Dict[str, List],
    probs_as_logits: bool,
) -> Tuple[Dict, Dict, Dict]:
    """Flatten per-image extraction dicts into big arrays keyed
    "{dataset} features|logits|latent_space_means" (reference utils.py:127-192).

    ``probs_as_logits`` applies log(p + 1e-10) when the architecture emits
    probabilities instead of logits.
    """
    if "no_obj" in data_dict[dataset_name].keys():
        no_obj_dict[dataset_name] = data_dict[dataset_name].pop("no_obj")

    all_features = []
    for im_results in data_dict[f"{dataset_name}"].values():
        if len(im_results["features"]) > 0:
            all_features.append(np.asarray(im_results["features"]))
    if len(all_features) > 0:
        aggregated_data_dict[f"{dataset_name} features"] = np.concatenate(
            all_features, axis=0
        )

    all_logits = []
    for im_results in data_dict[f"{dataset_name}"].values():
        if len(im_results["logits"]) > 0:
            logits = np.asarray(im_results["logits"])
            if probs_as_logits:
                all_logits.append(np.log(logits + 1e-10))
            else:
                all_logits.append(logits)
    if len(all_logits) > 0:
        aggregated_data_dict[f"{dataset_name} logits"] = np.concatenate(all_logits, axis=0)

    all_latent_space_means = []
    non_empty_predictions_ids[dataset_name] = []
    for im_id, im_results in data_dict[f"{dataset_name}"].items():
        if len(im_results["latent_space_means"]) > 0:
            all_latent_space_means.append(np.asarray(im_results["latent_space_means"]))
            non_empty_predictions_ids[dataset_name].extend(
                [im_id] * len(im_results["latent_space_means"])
            )
    aggregated_data_dict[f"{dataset_name} latent_space_means"] = np.concatenate(
        all_latent_space_means, axis=0
    )
    return aggregated_data_dict, no_obj_dict, non_empty_predictions_ids


def associate_precalculated_baselines_with_raw_predictions(
    data_dict: Dict[str, Dict],
    dataset_name: str,
    ood_baselines_dict: Dict[str, np.ndarray],
    baselines_names: List[str],
    non_empty_ids: List[str],
    is_ood: bool,
) -> Dict[str, Dict]:
    """Attach flat per-detection baseline scores back onto the per-image dicts
    (reference utils.py:195-244)."""
    for idx, im_id in enumerate(non_empty_ids):
        for baseline_name in baselines_names:
            if baseline_name not in data_dict[im_id].keys():
                data_dict[im_id][baseline_name] = []
            if is_ood:
                data_dict[im_id][baseline_name].append(
                    ood_baselines_dict[f"{dataset_name} {baseline_name}"][idx]
                )
            else:
                data_dict[im_id][baseline_name].append(
                    ood_baselines_dict[f"{baseline_name}"][idx]
                )
    return data_dict
