"""OoD detection metrics: AUROC / FPR@95 / AUPR with exact (sort-based) curves.

Replaces the reference's torchmetrics.functional calls (reference:
runia_core/evaluation/metrics.py:70-81) with a direct numpy implementation of
the same definitions. Label convention preserved: InD = 1 (positive),
OoD = 0 (reference metrics.py:60-61); FPR@95 = fpr at the first threshold
where TPR >= 0.95 (metrics.py:76).

torchmetrics pushes scores through a sigmoid when they fall outside [0, 1];
since the sigmoid is monotonic this changes thresholds but not the curves or
any reported metric, so we skip it and work on raw scores.

Heavy compute stays on device elsewhere; metric aggregation is host-side
numpy + pandas exactly like the reference's eval layer.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from runia_core_tpu.detectors import postprocessors_dict

__all__ = [
    "binary_roc",
    "binary_precision_recall_curve",
    "auc",
    "jax_auroc",
    "get_auroc_results",
    "plot_roc_ood_detector",
    "save_roc_ood_detector",
    "save_scores_plots",
    "get_pred_scores_plots",
    "log_evaluate_postprocessors",
    "select_and_log_best_larex",
    "subset_boxes",
    "get_gtu_uu_metrics",
]


def _optional_mlflow():
    try:
        import mlflow

        return mlflow
    except ImportError:  # pragma: no cover
        return None


# ---------------------------------------------------------------------------
# Exact curve primitives
# ---------------------------------------------------------------------------
def binary_roc(scores: np.ndarray, labels: np.ndarray):
    """Exact ROC curve: (fpr, tpr, thresholds), thresholds descending.

    Matches sklearn/torchmetrics at every distinct score threshold, with the
    (0, 0) point prepended.
    """
    scores = np.asarray(scores).ravel().astype(np.float64)
    labels = np.asarray(labels).ravel()
    order = np.argsort(-scores, kind="stable")
    sorted_scores = scores[order]
    sorted_labels = labels[order]
    distinct = np.where(np.diff(sorted_scores))[0]
    thr_idx = np.r_[distinct, len(scores) - 1]
    tps = np.cumsum(sorted_labels)[thr_idx].astype(np.float64)
    fps = (1 + thr_idx) - tps
    tpr = np.r_[0.0, tps] / max(tps[-1], 1e-12)
    fpr = np.r_[0.0, fps] / max(fps[-1], 1e-12)
    thresholds = np.r_[np.inf, sorted_scores[thr_idx]]
    return fpr, tpr, thresholds


def binary_precision_recall_curve(scores: np.ndarray, labels: np.ndarray):
    """Exact PR curve with sklearn conventions: recall decreasing, final
    point (precision=1, recall=0)."""
    scores = np.asarray(scores).ravel().astype(np.float64)
    labels = np.asarray(labels).ravel()
    order = np.argsort(-scores, kind="stable")
    sorted_scores = scores[order]
    sorted_labels = labels[order]
    distinct = np.where(np.diff(sorted_scores))[0]
    thr_idx = np.r_[distinct, len(scores) - 1]
    tps = np.cumsum(sorted_labels)[thr_idx].astype(np.float64)
    fps = (1 + thr_idx) - tps
    precision = tps / (tps + fps)
    recall = tps / max(tps[-1], 1e-12)
    # Reverse so recall decreases; append the (precision=1, recall=0) endpoint.
    precision = np.r_[precision[::-1], 1.0]
    recall = np.r_[recall[::-1], 0.0]
    thresholds = sorted_scores[thr_idx][::-1]
    return precision, recall, thresholds


def jax_auroc(ind_scores, ood_scores) -> "jnp.ndarray":
    """AUROC as a jittable on-device reduction (InD = positive class).

    For fused evaluation programs over large sharded score arrays; equals the
    exact rank statistic AUROC = (U - n_pos(n_pos+1)/2) / (n_pos * n_neg)
    with average ranks for ties (matches binary_roc + trapezoid exactly).
    """
    import jax
    import jax.numpy as jnp

    ind_scores = jnp.asarray(ind_scores).ravel()
    ood_scores = jnp.asarray(ood_scores).ravel()
    scores = jnp.concatenate([ind_scores, ood_scores])
    labels = jnp.concatenate(
        [jnp.ones_like(ind_scores), jnp.zeros_like(ood_scores)]
    )
    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    ranks = jnp.arange(1, scores.shape[0] + 1, dtype=jnp.float64 if scores.dtype == jnp.float64 else jnp.float32)
    # Average ranks over ties: group by equal score runs.
    is_new = jnp.concatenate([jnp.array([True]), sorted_scores[1:] != sorted_scores[:-1]])
    group_id = jnp.cumsum(is_new) - 1
    group_sum = jax.ops.segment_sum(ranks, group_id, num_segments=scores.shape[0])
    group_cnt = jax.ops.segment_sum(jnp.ones_like(ranks), group_id, num_segments=scores.shape[0])
    avg_rank = (group_sum / jnp.maximum(group_cnt, 1.0))[group_id]
    pos_ranks = jnp.sum(avg_rank * labels[order])
    n_pos = jnp.sum(labels)
    n_neg = labels.shape[0] - n_pos
    u = pos_ranks - n_pos * (n_pos + 1) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)


def auc(x: np.ndarray, y: np.ndarray) -> float:
    """Trapezoidal area handling monotonically decreasing x (sklearn.metrics.auc)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = np.diff(x)
    if np.all(dx <= 0):
        direction = -1.0
    elif np.all(dx >= 0):
        direction = 1.0
    else:
        raise ValueError("x is neither increasing nor decreasing")
    return float(direction * np.trapezoid(y, x))


# ---------------------------------------------------------------------------
# Reference API
# ---------------------------------------------------------------------------
def get_auroc_results(
    detect_exp_name: str,
    ind_samples_scores: np.ndarray,
    ood_samples_scores: np.ndarray,
    return_results_for_mlflow: bool = False,
) -> Union[pd.DataFrame, Tuple[pd.DataFrame, dict]]:
    """AUROC / FPR@95 / AUPR (+ full ROC) for one InD-vs-OoD experiment.

    Reference metrics.py:37-100: InD labeled 1, OoD labeled 0, FPR@95 at the
    first index with TPR >= 0.95, AUPR = auc(recall, precision).
    """
    ind_samples_scores = np.asarray(ind_samples_scores).ravel()
    ood_samples_scores = np.asarray(ood_samples_scores).ravel()
    scores = np.concatenate([ind_samples_scores, ood_samples_scores])
    labels = np.concatenate(
        [np.ones(ind_samples_scores.shape[0]), np.zeros(ood_samples_scores.shape[0])]
    ).astype(np.int32)

    fpr, tpr, _ = binary_roc(scores, labels)
    roc_auc = auc(fpr, tpr)
    fpr_95 = float(fpr[np.where(tpr >= 0.95)[0][0]])
    precision, recall, _ = binary_precision_recall_curve(scores, labels)
    aupr = auc(recall, precision)

    results_table = pd.DataFrame.from_dict(
        {detect_exp_name: [roc_auc, fpr_95, aupr, fpr.tolist(), tpr.tolist()]},
        orient="index",
        columns=["auroc", "fpr@95", "aupr", "fpr", "tpr"],
    )
    if not return_results_for_mlflow:
        return results_table
    results_for_mlflow = results_table.loc[detect_exp_name, ["auroc", "fpr@95", "aupr"]].to_dict()
    # MLFlow doesn't accept the character '@'
    results_for_mlflow["fpr_95"] = results_for_mlflow.pop("fpr@95")
    return results_table, results_for_mlflow


def plot_roc_ood_detector(results_table, plot_title: str = "Plot Title"):  # pragma: no cover
    """Show ROC curves for every row of a results table (metrics.py:103-128)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    _draw_roc_overlay(ax, results_table, plot_title, highlight=None)
    plt.show()


def _draw_roc_overlay(ax, results_table, plot_title, highlight):
    """Shared ROC-overlay renderer. ``highlight`` is an optional list of
    name substrings drawn solid/bold; everything else is dashed."""
    import numpy as _np

    for row_name in results_table.index:
        row = results_table.loc[row_name]
        if highlight is None:
            style = {}
        elif any(h in row_name for h in highlight):
            style = {"linestyle": "solid", "linewidth": 3.0}
        else:
            style = {"linestyle": "dashed", "linewidth": 1.7}
        ax.plot(row["fpr"], row["tpr"],
                label=f"{row_name}, AUROC={row['auroc']:.4f}", **style)
    ax.plot([0, 1], [0, 1], color="orange", linestyle="--")
    ticks = _np.arange(0.0, 1.1, step=0.1)
    ax.set_xticks(ticks)
    ax.set_yticks(ticks)
    ax.set_xlabel("False Positive Rate", fontsize=15)
    ax.set_ylabel("True Positive Rate", fontsize=15)
    ax.set_title(plot_title, fontweight="bold", fontsize=15)
    ax.legend(prop={"size": 12}, loc="lower right")


def save_roc_ood_detector(
    results_table: pd.DataFrame, postprocessors: List[str], plot_title: str = "Plot Title"
):
    """ROC overlay figure, highlighted postprocessors solid (metrics.py:131-173)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    _draw_roc_overlay(ax, results_table, plot_title, highlight=postprocessors)
    return fig


def save_scores_plots(
    scores_ind: np.ndarray,
    ood_scores_dict: Dict,
    ood_datasets_list: List[str],
    ind_dataset_name: str,
    post_processor_name: str = "LaREM",
) -> Dict:
    """Score-histogram figures per OoD dataset (metrics.py:176-221)."""
    import seaborn as sns

    assert post_processor_name in postprocessors_dict.keys()
    score_col = f"{post_processor_name} score"

    def labeled(scores, dataset):
        # Dataset column first so the hue legend lists it ahead of the
        # score values in DataFrame reprs / debug dumps.
        return pd.DataFrame({
            "Dataset": dataset, score_col: np.ravel(scores),
        })

    ind_frame = labeled(scores_ind, ind_dataset_name)
    plots_dict = {}
    for ood_dataset_name in ood_datasets_list:
        both = pd.concat(
            [ind_frame, labeled(ood_scores_dict[ood_dataset_name],
                                ood_dataset_name)],
            ignore_index=True,
        )
        plots_dict[f"{ood_dataset_name}_{post_processor_name}_scores"] = sns.displot(
            both, x=score_col, hue="Dataset", kind="hist", fill=True
        )
    return plots_dict


def get_pred_scores_plots(
    experiment: Dict, ood_datasets_list: list, title: str, ind_dataset_name: str
):
    """Predictive-score density figure (metrics.py:224-262)."""
    import matplotlib.pyplot as plt
    import seaborn as sns

    x_axis = experiment["x_axis"]
    frames = [
        pd.DataFrame({"Dataset": name, x_axis: np.ravel(experiment[key])})
        for key, name in [("InD", ind_dataset_name)]
        + [(d, d) for d in ood_datasets_list]
    ]
    # displot draws its own hue legend; an extra plt.legend() call would
    # only warn about missing labeled artists.
    ax = sns.displot(
        pd.concat(frames, ignore_index=True), x=x_axis, hue="Dataset",
        kind="hist", fill=True,
    ).set(title=title)
    plt.tight_layout()
    return ax


def log_evaluate_postprocessors(
    ind_dict: Dict[str, np.ndarray],
    ood_dict: Dict[str, np.ndarray],
    ood_datasets_names: List[str],
    experiment_name_extension: str = "",
    return_density_scores: Optional[str] = None,
    log_step: Optional[int] = None,
    mlflow_logging: bool = False,
    postprocessors=None,
    cfg=None,
) -> Dict[str, Union[pd.DataFrame, np.ndarray, Dict[str, np.ndarray]]]:
    """Fit + evaluate a list of latent-space postprocessors (metrics.py:265-380).

    Unlike the reference (whose ``postprocessors=None`` default listed every
    registry key but then crashed instantiating OodPostprocessors —
    SURVEY.md section 7.4), the default here is the documented
    ("LaRED", "LaREM", "LaREK") trio, and all registered classes construct
    uniformly via ``cls(cfg=cfg)``.
    """
    if return_density_scores is not None:
        assert return_density_scores in postprocessors_dict.keys()
    if postprocessors is None:
        postprocessors = ("LaRED", "LaREM", "LaREK")

    overall_metrics_df = pd.DataFrame(columns=["auroc", "fpr@95", "aupr", "fpr", "tpr"])

    ind_scores_dict = {}
    ood_scores_dict = {}
    for postprocessor in postprocessors:
        postp_instance = postprocessors_dict[postprocessor](cfg=cfg)
        postp_instance._setup_flag = False
        postp_instance.setup(
            ind_dict["train latent_space_means"], ind_train_labels=ind_dict.get("train labels")
        )
        ind_scores_dict[postprocessor] = postp_instance.postprocess(
            ind_dict["valid latent_space_means"], pred_labels=ind_dict.get("valid labels")
        )
        ood_scores_dict[postprocessor] = {}
        for ood_dataset_name in ood_datasets_names:
            ood_scores_dict[postprocessor][ood_dataset_name] = postp_instance.postprocess(
                ood_dict[f"{ood_dataset_name} latent_space_means"],
                pred_labels=ood_dict.get(f"{ood_dataset_name} labels"),
            )

    postprocessors_experiments = {}
    for ood_dataset_name in ood_datasets_names:
        for postprocessor in postprocessors:
            postprocessors_experiments[f"{ood_dataset_name} {postprocessor}"] = {
                "InD": ind_scores_dict[postprocessor],
                "OoD": ood_scores_dict[postprocessor][ood_dataset_name],
            }

    mlflow = _optional_mlflow()
    for experiment_name, experiment in postprocessors_experiments.items():
        experiment_name = experiment_name + experiment_name_extension
        results_df, results_mlflow = get_auroc_results(
            detect_exp_name=experiment_name,
            ind_samples_scores=experiment["InD"],
            ood_samples_scores=experiment["OoD"],
            return_results_for_mlflow=True,
        )
        if "PCA" in experiment_name:
            results_mlflow = {
                f"{' '.join(experiment_name.split()[:-1])}_{k}": v
                for k, v in results_mlflow.items()
            }
        else:
            results_mlflow = {f"{experiment_name}_{k}": v for k, v in results_mlflow.items()}
        if mlflow_logging and mlflow is not None:  # pragma: no cover
            mlflow.log_metrics(results_mlflow, step=log_step)
        for result in results_df.index.values:
            overall_metrics_df.loc[result] = results_df.loc[result]

    results = {"results_df": overall_metrics_df}
    if return_density_scores is not None:
        results["InD"] = ind_scores_dict[return_density_scores]
        results["OoD"] = ood_scores_dict[return_density_scores]
    return results


def select_and_log_best_larex(
    overall_metrics_df: pd.DataFrame,
    n_pca_components_list: Union[list, Tuple],
    postprocessor_name: str,
    multiple_ood_datasets_flag: bool,
    log_mlflow: bool = False,
) -> Tuple[float, float, float, int]:
    """Mean metrics per PCA setting, pick best AUROC (metrics.py:383-462).

    Configurations considered: the no-PCA run (rows mentioning the
    postprocessor but no "PCA") and one entry per n_pca_components (rows
    ending exactly in "PCA {n}"). Each configuration's metrics are averaged
    across OoD datasets; the winner is the highest mean AUROC.
    """
    assert postprocessor_name in postprocessors_dict.keys(), f"Got {postprocessor_name}"
    summary_cols = ["auroc", "fpr@95", "aupr"]

    def config_rows(predicate):
        selected = [
            overall_metrics_df.loc[row, summary_cols]
            for row in overall_metrics_df.index
            if postprocessor_name in row and predicate(row)
        ]
        return pd.DataFrame(selected, columns=summary_cols)

    configs = {
        postprocessor_name: config_rows(
            lambda row: "anomalies" not in row and "PCA" not in row
        )
    }
    for n in n_pca_components_list:
        configs[f"{postprocessor_name} PCA {n}"] = config_rows(
            lambda row, n=n: f"PCA {n}" in row and row.split(f"PCA {n}")[-1] == ""
        )

    means_df = pd.DataFrame(
        {name: rows.mean() for name, rows in configs.items()}
    ).T
    stds_df = pd.DataFrame(
        {name: rows.std() for name, rows in configs.items()}
    ).T

    best_index = means_df[means_df.auroc == means_df.auroc.max()].index[0]
    best_n_comps = int(best_index.split()[-1]) if "PCA" in best_index else 0
    best_mean = means_df.loc[best_index]

    mlflow = _optional_mlflow()
    if log_mlflow and mlflow is not None:  # pragma: no cover
        for metric, short in (("auroc", "auroc"), ("aupr", "aupr"), ("fpr@95", "fpr95")):
            mlflow.log_metric(f"{postprocessor_name}_{short}_mean", best_mean[metric])
            if multiple_ood_datasets_flag:
                mlflow.log_metric(
                    f"{postprocessor_name}_{short}_std", stds_df.loc[best_index, metric]
                )
        mlflow.log_metric(f"Best {postprocessor_name}", best_n_comps)
    return best_mean["auroc"], best_mean["aupr"], best_mean["fpr@95"], best_n_comps


def subset_boxes(
    ind_dict: Dict[str, np.ndarray],
    ood_dict: Dict[str, np.ndarray],
    ind_train_limit: int,
    ood_limit: int,
    random_seed: int,
    ood_names: List[str],
    non_empty_predictions_id: Optional[Dict[str, List]] = None,
    non_empty_predictions_ood: Optional[Dict[str, List]] = None,
):
    """Random subsetting of extracted boxes for faster eval (metrics.py:465-575).

    Train boxes are subsampled uniformly; the InD valid set is subsampled by
    whole images (so per-image prediction dicts stay consistent); OoD sets are
    subsampled uniformly. Same seed -> same subsets.
    """
    from collections import Counter

    np.random.seed(random_seed)

    def take(store, split, idx):
        """Apply one index selection to every array of a split."""
        for kind in ("latent_space_means", "logits", "features"):
            key = f"{split} {kind}"
            if key in store:
                store[key] = store[key][np.asarray(idx)]

    train_key = "train latent_space_means"
    if train_key in ind_dict and ind_dict[train_key].shape[0] > ind_train_limit:
        total = ind_dict[train_key].shape[0]
        print(f"Subsetting train set to {ind_train_limit} from {total} extracted boxes")
        take(ind_dict, "train",
             np.random.choice(total, size=ind_train_limit, replace=False))

    valid_key = "valid latent_space_means"
    if (
        valid_key in ind_dict
        and ind_dict[valid_key].shape[0] > ood_limit
        and non_empty_predictions_id is not None
    ):
        # Pick whole images until ~ood_limit boxes are kept.
        per_image = Counter(non_empty_predictions_id["valid"])
        avg_boxes = int(ind_dict[valid_key].shape[0] / len(per_image))
        kept_images = np.random.choice(
            list(per_image.keys()), size=int(ood_limit / avg_boxes), replace=False
        )
        kept_set = set(np.asarray(kept_images).tolist())
        chosen = [
            i for i, im_id in enumerate(non_empty_predictions_id["valid"])
            if im_id in kept_set
        ]
        print(
            f"Subsetting valid set to {len(chosen)} from "
            f"{ind_dict[valid_key].shape[0]} extracted boxes"
        )
        take(ind_dict, "valid", chosen)
        if non_empty_predictions_id is not None:
            non_empty_predictions_id["valid"] = [
                non_empty_predictions_id["valid"][i] for i in chosen
            ]

    for name in ood_names:
        total = ood_dict[f"{name} latent_space_means"].shape[0]
        if total > ood_limit:
            print(f"Subsetting {name} to {ood_limit} from {total} extracted boxes")
            chosen = np.random.choice(total, size=ood_limit, replace=False)
            take(ood_dict, name, chosen)
            if non_empty_predictions_ood is not None:
                non_empty_predictions_ood[name] = [
                    non_empty_predictions_ood[name][i] for i in chosen
                ]

    if non_empty_predictions_id is not None and non_empty_predictions_ood is not None:
        return ind_dict, ood_dict, non_empty_predictions_id, non_empty_predictions_ood
    return ind_dict, ood_dict


def get_gtu_uu_metrics(
    ind_dataset_name: str,
    ind_gt_annotations_path: str,
    ind_data_dict: Dict,
    ood_data_dict: Dict,
    ood_datasets_names: List[str],
    ood_annotations_paths: Dict[str, str],
    methods_names: List[str],
    metric_2007: bool,
    min_conf_score: Optional[float] = None,
) -> Dict[str, Dict[str, Dict[str, np.ndarray]]]:
    """AUROC split into GTU (ground-truth unknown) vs UU (unknown unknown)
    detections (reference metrics.py:578-657): InD valid scores vs the OoD
    detections grouped by whether they overlap an unknown GT box."""
    from runia_core_tpu.evaluation.open_set import get_boxes_gtu_and_uu_ood_dataset

    def flat_scores(method):
        values = [
            v for pred_dict in ind_data_dict["valid"].values()
            for v in pred_dict[method]
        ]
        return np.array([values]).squeeze()

    def auroc_vs(ind_scores, ood_scores):
        _, metrics = get_auroc_results(
            detect_exp_name="", ind_samples_scores=ind_scores,
            ood_samples_scores=ood_scores, return_results_for_mlflow=True,
        )
        return metrics

    id_valid_scores = {method: flat_scores(method) for method in methods_names}
    results: Dict = {}
    for ood_name in ood_datasets_names:
        results[ood_name] = {}
        for method in methods_names:
            gtu, uu = get_boxes_gtu_and_uu_ood_dataset(
                id_dataset_name=ind_dataset_name,
                id_gt_annotations_path=ind_gt_annotations_path,
                predictions_dict=ood_data_dict[ood_name],
                method_name=method,
                test_gt_annotations_path=ood_annotations_paths[ood_name],
                metric_2007=metric_2007,
                evaluating_ood=True,
                min_conf_score=min_conf_score,
            )
            results[ood_name][method] = {
                "gtu": auroc_vs(id_valid_scores[method], gtu),
                "uu": auroc_vs(id_valid_scores[method], uu),
            }
    return results
