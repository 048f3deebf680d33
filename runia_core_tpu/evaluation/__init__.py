"""Evaluation layer: entropy engine, metrics, baselines, benchmark harness."""

from runia_core_tpu.evaluation.entropy import (
    get_dl_h_z,
    neighbors_for,
    single_image_entropy_calculation,
)
from runia_core_tpu.evaluation.baselines import (
    baseline_name_dict,
    calculate_all_baselines,
    get_labels_from_logits,
    remove_latent_features,
)
from runia_core_tpu.evaluation.latent_space import (
    log_baselines,
    log_evaluate_larex,
    plot_roc_curves,
)
from runia_core_tpu.evaluation.metrics import (
    get_auroc_results,
    log_evaluate_postprocessors,
    save_roc_ood_detector,
    save_scores_plots,
    select_and_log_best_larex,
    subset_boxes,
)

__all__ = [
    "get_dl_h_z",
    "single_image_entropy_calculation",
    "neighbors_for",
    "calculate_all_baselines",
    "get_labels_from_logits",
    "remove_latent_features",
    "baseline_name_dict",
    "log_evaluate_larex",
    "log_baselines",
    "plot_roc_curves",
    "get_auroc_results",
    "log_evaluate_postprocessors",
    "save_roc_ood_detector",
    "save_scores_plots",
    "select_and_log_best_larex",
    "subset_boxes",
]
