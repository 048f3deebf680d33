"""LaREx benchmark driver: baselines -> full-vector eval -> PCA sweep ->
best-method selection -> threshold fitting -> ROC/score plots.

Behavior-equivalent to reference runia_core/evaluation/latent_space.py:30-605
with mlflow optional (local-folder fallback preserved). The default
``postprocessors`` list is the documented LaRED/LaREM/LaREK trio instead of
the reference's every-registry-key default which crashed on OodPostprocessor
constructors (SURVEY.md section 7.4).
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict, List, Tuple, Union

import numpy as np
import pandas as pd

from runia_core_tpu.detectors import postprocessors_dict
from runia_core_tpu.evaluation.baselines import baseline_name_dict
from runia_core_tpu.evaluation.metrics import (
    get_auroc_results,
    get_pred_scores_plots,
    log_evaluate_postprocessors,
    save_roc_ood_detector,
    save_scores_plots,
    select_and_log_best_larex,
)
from runia_core_tpu.reduction import apply_pca_ds_split, apply_pca_transform

__all__ = ["log_evaluate_larex", "log_baselines", "plot_roc_curves"]

DEFAULT_POSTPROCESSORS = ("LaRED", "LaREM", "LaREK")


def _optional_mlflow():
    try:
        import mlflow

        return mlflow
    except ImportError:  # pragma: no cover
        return None


def log_evaluate_larex(
    cfg,
    baselines_names: List[str],
    ood_baselines_scores: Dict[str, np.ndarray],
    ind_data_dict: Dict[str, np.ndarray],
    ood_data_dict: Dict[str, np.ndarray],
    mlflow_run_name: str,
    mlflow_logging: bool,
    visualize_score: Union[None, str] = None,
    postprocessors: Union[None, List[str]] = None,
    save_csv: bool = False,
    save_plots_to_local: bool = False,
) -> Tuple[pd.DataFrame, Dict[str, Dict[str, float]], Dict[str, float], Dict[str, np.ndarray]]:
    """Full InD-vs-OoD evaluation sweep (reference latent_space.py:30-221)."""
    if postprocessors is None:
        postprocessors = DEFAULT_POSTPROCESSORS
    if visualize_score is not None:
        assert visualize_score in postprocessors_dict.keys()
    mlflow = _optional_mlflow()
    current_date = datetime.today().strftime("%Y-%m-%d_%H:%M:%S")
    overall_metrics_df = pd.DataFrame(columns=["auroc", "fpr@95", "aupr", "fpr", "tpr"])

    logs_folder = f"./results_logs/ind_{cfg.ind_dataset}/{mlflow_run_name}"
    if not mlflow_logging and save_plots_to_local:  # pragma: no cover
        os.makedirs(logs_folder, exist_ok=False)

    # ---------------- Baselines ----------------
    if len(baselines_names) > 0:
        overall_metrics_df = log_baselines(
            baselines_names=baselines_names,
            ind_dataset=cfg.ind_dataset,
            ind_data_dict=ind_data_dict,
            ood_baselines_scores=ood_baselines_scores,
            ood_datasets=cfg.ood_datasets,
            overall_metrics_df=overall_metrics_df,
            mlflow_logging=mlflow_logging,
            logs_folder=None if not save_plots_to_local else logs_folder,
        )

    # ---------------- LaREx, full latent vectors ----------------
    print(f"{postprocessors} running...")
    results_eval = log_evaluate_postprocessors(
        ind_dict=ind_data_dict,
        ood_dict=ood_data_dict,
        ood_datasets_names=cfg.ood_datasets,
        experiment_name_extension="",
        return_density_scores=visualize_score,
        mlflow_logging=mlflow_logging,
        postprocessors=postprocessors,
        cfg=cfg,
    )
    for result in results_eval["results_df"].index.values:
        overall_metrics_df.loc[result] = results_eval["results_df"].loc[result]
    if visualize_score is not None:
        postp_scores_plots_dict = save_scores_plots(
            scores_ind=results_eval["InD"],
            ood_scores_dict=results_eval["OoD"],
            ood_datasets_list=cfg.ood_datasets,
            ind_dataset_name=cfg.ind_dataset,
            post_processor_name=visualize_score,
        )
        for plot_name, plot in postp_scores_plots_dict.items():  # pragma: no cover
            if mlflow_logging and mlflow is not None:
                mlflow.log_figure(figure=plot.figure, artifact_file=f"figs/{plot_name}.png")
            elif save_plots_to_local:
                plot.figure.savefig(logs_folder + f"/{plot_name}.png")

    # ---------------- PCA sweep ----------------
    for n_components in cfg.n_pca_components:
        ind_dict_pca = {}
        pca_ind_train, pca_transformation = apply_pca_ds_split(
            samples=ind_data_dict["train latent_space_means"], nro_components=n_components
        )
        pca_ind_valid = apply_pca_transform(
            ind_data_dict["valid latent_space_means"], pca_transformation
        )
        ind_dict_pca["train latent_space_means"] = pca_ind_train
        ind_dict_pca["valid latent_space_means"] = pca_ind_valid
        if "train labels" in ind_data_dict:
            ind_dict_pca["train labels"] = ind_data_dict["train labels"]
        if "valid labels" in ind_data_dict:
            ind_dict_pca["valid labels"] = ind_data_dict["valid labels"]
        ood_dict_pca = {}
        for ood_dataset_name in cfg.ood_datasets:
            ood_dict_pca[f"{ood_dataset_name} latent_space_means"] = apply_pca_transform(
                ood_data_dict[f"{ood_dataset_name} latent_space_means"], pca_transformation
            )
            if f"{ood_dataset_name} labels" in ood_data_dict:
                ood_dict_pca[f"{ood_dataset_name} labels"] = ood_data_dict[
                    f"{ood_dataset_name} labels"
                ]
        results_eval = log_evaluate_postprocessors(
            ind_dict=ind_dict_pca,
            ood_dict=ood_dict_pca,
            ood_datasets_names=cfg.ood_datasets,
            experiment_name_extension=f" PCA {n_components}",
            return_density_scores=None,
            log_step=n_components,
            mlflow_logging=mlflow_logging,
            postprocessors=postprocessors,
            cfg=cfg,
        )
        for result in results_eval["results_df"].index.values:
            overall_metrics_df.loc[result] = results_eval["results_df"].loc[result]

    if save_csv:  # pragma: no cover
        os.makedirs(f"./results_csvs/{cfg.mlflow_experiment_name}", exist_ok=True)
        overall_metrics_df_name = (
            f"./results_csvs/{cfg.mlflow_experiment_name}/{mlflow_run_name}_{current_date}.csv.gz"
        )
        print(f"Saving csv to {overall_metrics_df_name}")
        overall_metrics_df.to_csv(path_or_buf=overall_metrics_df_name, compression="gzip")
        if mlflow_logging and mlflow is not None:
            mlflow.log_artifact(overall_metrics_df_name)

    # ---------------- Best-method selection + thresholds ----------------
    best_postprocessors_dict = _get_best_postprocessors_metrics(
        baselines_names=baselines_names,
        overall_metrics_df=overall_metrics_df,
        mlflow_logging=mlflow_logging,
        postprocessors=postprocessors,
        n_pca_components=cfg.n_pca_components,
        ood_datasets_names=cfg.ood_datasets,
    )
    print(
        "Best postprocessors metrics: "
        f"{ {k: v for k, v in best_postprocessors_dict.items() if k != 'best'} }"
    )
    postprocessor_thresholds, ood_data_dict = _get_best_post_processor_thresholds(
        postprocessors_names=postprocessors,
        best_postprocessors_dict=best_postprocessors_dict,
        cfg=cfg,
        ind_data=ind_data_dict,
        ood_data=ood_data_dict,
        logs_folder=None if not save_plots_to_local else logs_folder,
        log_mlflow=mlflow_logging,
    )
    print(f"Best postprocessor thresholds: {postprocessor_thresholds}")

    plot_roc_curves(
        ood_datasets=cfg.ood_datasets,
        postprocessors=postprocessors,
        overall_metrics_df=overall_metrics_df,
        best_postprocessors_dict=best_postprocessors_dict,
        mlflow_logging=mlflow_logging,
        ind_dataset=cfg.ind_dataset,
        logs_folder=None if not save_plots_to_local else logs_folder,
        baselines_names=baselines_names,
    )
    return overall_metrics_df, best_postprocessors_dict, postprocessor_thresholds, ood_data_dict


def log_baselines(
    baselines_names: List[str],
    ind_dataset: str,
    ind_data_dict: Dict[str, np.ndarray],
    ood_baselines_scores: Dict[str, np.ndarray],
    ood_datasets: List[str],
    overall_metrics_df: pd.DataFrame,
    mlflow_logging: bool,
    logs_folder: Union[str, None],
) -> pd.DataFrame:
    """AUROC-log all precalculated baselines (reference latent_space.py:224-322).

    pred_h / mi scores are negated so higher = InD, like the reference.
    """
    print("Logging baselines")
    mlflow = _optional_mlflow()
    baselines_experiments = {}
    for baseline in baselines_names:
        for ood_dataset in ood_datasets:
            if baseline == "pred_h" or baseline == "mi":
                baselines_experiments[f"{ood_dataset} {baseline}"] = {
                    "InD": -ind_data_dict[baseline],
                    "OoD": -ood_baselines_scores[f"{ood_dataset} {baseline}"],
                }
            else:
                baselines_experiments[f"{ood_dataset} {baseline}"] = {
                    "InD": ind_data_dict[baseline],
                    "OoD": ood_baselines_scores[f"{ood_dataset} {baseline}"],
                }

    baselines_plots = {}
    for baseline in baselines_names:
        entry = {"InD": ind_data_dict[baseline]}
        entry["x_axis"] = baseline_name_dict[baseline]["x_axis"]
        entry["plot_name"] = baseline_name_dict[baseline]["plot_name"]
        for ood_dataset in ood_datasets:
            entry[ood_dataset] = ood_baselines_scores[f"{ood_dataset} {baseline}"]
        baselines_plots[baseline_name_dict[baseline]["plot_title"]] = entry

    for plot_title, experiment in baselines_plots.items():
        pred_score_plot = get_pred_scores_plots(
            experiment, ood_datasets, title=plot_title, ind_dataset_name=ind_dataset
        )
        if mlflow_logging and mlflow is not None:  # pragma: no cover
            mlflow.log_figure(
                figure=pred_score_plot.figure,
                artifact_file=f"figs/{experiment['plot_name']}.png",
            )
        elif logs_folder is not None:  # pragma: no cover
            pred_score_plot.figure.savefig(logs_folder + f"/{experiment['plot_name']}.png")

    for experiment_name, experiment in baselines_experiments.items():
        results_df, results_mlflow = get_auroc_results(
            detect_exp_name=experiment_name,
            ind_samples_scores=experiment["InD"],
            ood_samples_scores=experiment["OoD"],
            return_results_for_mlflow=True,
        )
        results_mlflow = {f"{experiment_name}_{k}": v for k, v in results_mlflow.items()}
        if mlflow_logging and mlflow is not None:  # pragma: no cover
            mlflow.log_metrics(results_mlflow)
        for results in results_df.index.values:
            overall_metrics_df.loc[results] = results_df.loc[results]
    return overall_metrics_df


def plot_roc_curves(
    ood_datasets: List[str],
    postprocessors: List[str],
    overall_metrics_df: pd.DataFrame,
    best_postprocessors_dict: Dict,
    mlflow_logging: bool,
    ind_dataset: str,
    logs_folder: Union[str, None],
    baselines_names: List[str],
) -> None:
    """ROC overlays per OoD dataset + per-postprocessor PCA sweeps
    (reference latent_space.py:325-419)."""
    mlflow = _optional_mlflow()
    dfs_dict = {}
    for ood_dataset in ood_datasets:
        dfs_dict["base"] = pd.DataFrame(columns=["auroc", "fpr@95", "aupr", "fpr", "tpr"])
        for postprocessor in postprocessors:
            dfs_dict[postprocessor] = pd.DataFrame(
                columns=["auroc", "fpr@95", "aupr", "fpr", "tpr"]
            )
        for row_name in overall_metrics_df.index:
            if ood_dataset in row_name and (
                row_name in best_postprocessors_dict["best"]
                or row_name.split(f"{ood_dataset} ")[-1] in baselines_names
            ):
                dfs_dict["base"].loc[row_name] = overall_metrics_df.loc[row_name]
                dfs_dict["base"].rename(
                    index={row_name: row_name.split(ood_dataset)[1]}, inplace=True
                )
            for postprocessor in postprocessors:
                if ood_dataset in row_name and "PCA" in row_name and postprocessor in row_name:
                    dfs_dict[postprocessor].loc[row_name] = overall_metrics_df.loc[row_name]
                    dfs_dict[postprocessor].rename(
                        index={row_name: row_name.split(ood_dataset)[1]}, inplace=True
                    )
        roc_curve = save_roc_ood_detector(
            results_table=dfs_dict["base"],
            plot_title=f"ROC {ind_dataset} vs {ood_dataset}",
            postprocessors=postprocessors,
        )
        if mlflow_logging and mlflow is not None:  # pragma: no cover
            mlflow.log_figure(figure=roc_curve, artifact_file=f"figs/roc_{ood_dataset}.png")
        elif logs_folder is not None:  # pragma: no cover
            roc_curve.savefig(logs_folder + f"/roc_{ood_dataset}.png")

        for postprocessor in postprocessors:
            roc_curve_pca_postp = save_roc_ood_detector(
                results_table=dfs_dict[postprocessor],
                plot_title=f"ROC {ind_dataset} vs {ood_dataset} {postprocessor} PCA",
                postprocessors=postprocessors,
            )
            if mlflow_logging and mlflow is not None:  # pragma: no cover
                mlflow.log_figure(
                    figure=roc_curve_pca_postp,
                    artifact_file=f"figs/roc_{ood_dataset}_pca_{postprocessor}.png",
                )
            elif logs_folder is not None:  # pragma: no cover
                roc_curve_pca_postp.savefig(
                    logs_folder + f"/roc_{ood_dataset}_pca_{postprocessor}.png"
                )


def _get_best_postprocessors_metrics(
    baselines_names: List[str],
    overall_metrics_df: pd.DataFrame,
    mlflow_logging: bool,
    postprocessors: List[str],
    n_pca_components: List[int],
    ood_datasets_names: List[str],
) -> Dict[str, Dict[str, float]]:
    """Per-baseline means + best PCA setting per postprocessor
    (reference latent_space.py:421-518)."""
    mlflow = _optional_mlflow()
    multiple_ood_datasets_flag = len(ood_datasets_names) > 1
    all_aurocs, all_auprs, all_fprs = [], [], []
    if len(baselines_names) > 0:
        for baseline in baselines_names:
            temp_df = pd.DataFrame(columns=["auroc", "fpr@95", "aupr", "fpr", "tpr"])
            for row_name in overall_metrics_df.index:
                if baseline in row_name:
                    temp_df.loc[row_name] = overall_metrics_df.loc[row_name]
                    temp_df.rename(index={row_name: row_name.split(baseline)[0]}, inplace=True)
            all_aurocs.append(temp_df["auroc"].mean())
            all_auprs.append(temp_df["aupr"].mean())
            all_fprs.append(temp_df["fpr@95"].mean())
            if mlflow_logging and mlflow is not None:  # pragma: no cover
                mlflow.log_metric(f"{baseline}_auroc_mean", temp_df["auroc"].mean())
                mlflow.log_metric(f"{baseline}_auroc_std", temp_df["auroc"].std())
                mlflow.log_metric(f"{baseline}_aupr_mean", temp_df["aupr"].mean())
                mlflow.log_metric(f"{baseline}_aupr_std", temp_df["aupr"].std())
                mlflow.log_metric(f"{baseline}_fpr95_mean", temp_df["fpr@95"].mean())
                mlflow.log_metric(f"{baseline}_fpr95_std", temp_df["fpr@95"].std())

    best_postprocessors_dict = {"best": []}
    for postprocessor in postprocessors:
        best_postprocessors_dict[postprocessor] = {}
        auroc, aupr, fpr, best_comp = select_and_log_best_larex(
            overall_metrics_df,
            n_pca_components,
            postprocessor_name=postprocessor,
            log_mlflow=mlflow_logging,
            multiple_ood_datasets_flag=multiple_ood_datasets_flag,
        )
        if best_comp == 0:
            best_postprocessors_dict[postprocessor]["best_comp"] = f"{postprocessor}"
        else:
            best_postprocessors_dict[postprocessor]["best_comp"] = (
                f"{postprocessor} PCA {best_comp}"
            )
        best_postprocessors_dict[postprocessor]["auroc"] = auroc
        best_postprocessors_dict[postprocessor]["aupr"] = aupr
        best_postprocessors_dict[postprocessor]["fpr"] = fpr
        all_aurocs.append(auroc)
        all_auprs.append(aupr)
        all_fprs.append(fpr)
        for ood_dataset in ood_datasets_names:
            best_postprocessors_dict["best"].append(
                f"{ood_dataset} {best_postprocessors_dict[postprocessor]['best_comp']}"
            )

    if mlflow_logging and mlflow is not None and len(ood_datasets_names) > 1:  # pragma: no cover
        mlflow.log_metric("global_auroc_mean", np.mean(all_aurocs))
        mlflow.log_metric("global_auroc_std", np.std(all_aurocs))
        mlflow.log_metric("global_aupr_mean", np.mean(all_auprs))
        mlflow.log_metric("global_aupr_std", np.std(all_auprs))
        mlflow.log_metric("global_fpr_mean", np.mean(all_fprs))
        mlflow.log_metric("global_fpr_std", np.std(all_fprs))
    return best_postprocessors_dict


def _get_best_post_processor_thresholds(
    postprocessors_names: List,
    best_postprocessors_dict: Dict,
    cfg,
    ind_data: Dict[str, np.ndarray],
    ood_data: Dict[str, np.ndarray],
    logs_folder: Union[str, None],
    log_mlflow: bool = False,
) -> Tuple[Dict[str, float], Dict[str, np.ndarray]]:
    """Refit best configs, threshold = mean - 1.645*std of InD valid scores
    (reference latent_space.py:521-605)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mlflow = _optional_mlflow()
    postprocessor_thresholds = {}
    for postprocessor_name in postprocessors_names:
        train_data = ind_data["train latent_space_means"].copy()
        valid_data = ind_data["valid latent_space_means"].copy()
        pca_transformation = None
        postp_instance = postprocessors_dict[postprocessor_name](cfg=cfg)
        postp_instance._setup_flag = False
        best_postp = best_postprocessors_dict[postprocessor_name]["best_comp"]
        if "PCA" in best_postp:
            n_pca_comps = int(best_postp.split("PCA")[1])
            train_data, pca_transformation = apply_pca_ds_split(
                samples=train_data, nro_components=n_pca_comps
            )
        postp_instance.setup(train_data, ind_train_labels=ind_data.get("train labels"))
        if "PCA" in best_postp:
            valid_data = apply_pca_transform(valid_data, pca_transformation)
        ind_valid_postp = postp_instance.postprocess(
            valid_data, pred_labels=ind_data.get("valid labels")
        )
        mean_ind_valid, std_ind_valid = np.mean(ind_valid_postp), np.std(ind_valid_postp)
        threshold_postp = mean_ind_valid - (1.645 * std_ind_valid)
        postprocessor_thresholds[best_postp] = threshold_postp

        fig, ax = plt.subplots(figsize=(8, 6))
        ax.hist(ind_valid_postp, bins=100, label="InD valid set", alpha=0.4)
        for ood_dataset_name in cfg.ood_datasets:
            ood_dataset = ood_data[f"{ood_dataset_name} latent_space_means"].copy()
            if "PCA" in best_postp:
                ood_dataset = apply_pca_transform(ood_dataset, pca_transformation)
            ood_postp = postp_instance.postprocess(
                ood_dataset, pred_labels=ood_data.get(f"{ood_dataset_name} labels")
            )
            ood_data[f"{ood_dataset_name} {best_postp}"] = ood_postp
            ax.hist(ood_postp, bins=100, label=f"OoD {ood_dataset_name} ", alpha=0.4)
        ax.vlines(
            x=threshold_postp,
            ymin=0,
            ymax=ax.dataLim.bounds[3],
            colors="r",
            label=f"95% threshold={round(threshold_postp, 2)}",
        )
        ax.legend()
        ax.set_xlabel("Score")
        ax.set_ylabel("Frquency")
        ax.set_title(f"Empirical {best_postp} score distribution")
        if log_mlflow and mlflow is not None:  # pragma: no cover
            mlflow.log_metric(f"Threshold_{best_postp}", threshold_postp)
            mlflow.log_figure(figure=fig, artifact_file=f"figs/{best_postp}_score_threshold.png")
        elif logs_folder is not None:  # pragma: no cover
            fig.savefig(f"{logs_folder}/{best_postp}_score_threshold.png")
        plt.close(fig)
    return postprocessor_thresholds, ood_data
