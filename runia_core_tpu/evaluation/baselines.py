"""Baselines harness: compute any subset of the post-hoc OoD scores from
pre-extracted {features, logits} dictionaries.

Behavior-equivalent to reference runia_core/evaluation/baselines.py:37-854,
driving the TPU detector classes instead of torch/faiss. Key preserved
semantics: RCNN background-class stripping for 21/11-dim logits in
``get_labels_from_logits`` (baselines.py:645-655), 'raw' as thresholdless
MSP (baselines.py:395-425), and the per-baseline cfg hyperparameter keys.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from runia_core_tpu.detectors import (
    ASH,
    DDU,
    DICE,
    DICEReAct,
    GEN,
    KNN,
    MSP,
    Energy,
    Mahalanobis,
    ReAct,
    ViM,
)
from runia_core_tpu.detectors.logits import msp_score

__all__ = [
    "remove_latent_features",
    "calculate_all_baselines",
    "get_labels_from_logits",
    "baseline_name_dict",
]


def _run_detector(postp, ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict,
                  key, ind_input="valid features", ood_suffix="features", **post_kwargs):
    ind_data_dict[key] = postp.postprocess(
        test_data=ind_data_dict[ind_input], **post_kwargs
    )
    for ood_name in ood_names:
        ood_baselines_dict[f"{ood_name} {key}"] = postp.postprocess(
            test_data=ood_data_dict[f"{ood_name} {ood_suffix}"], **post_kwargs
        )
    return ind_data_dict, ood_baselines_dict


def get_dice_score_from_features(
    fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict, percentile
):
    """DICE energy scores (reference baselines.py:37-90)."""
    print("Calculating DICE score")
    postp = DICE(
        flip_sign=False,
        dice_percentile=percentile,
        num_classes=ind_data_dict["train logits"].shape[1],
    )
    postp.setup(
        ind_train_data=ind_data_dict["train features"],
        valid_feats=ind_data_dict["valid features"],
        final_linear_layer_params=fc_params,
    )
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "dice")


def get_react_score_from_features(
    fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict, percentile
):
    """ReAct clip + energy (reference baselines.py:93-143)."""
    print("Calculating ReAct score")
    postp = ReAct(flip_sign=False, react_percentile=percentile)
    postp.setup(
        ind_train_data=ind_data_dict["train features"],
        valid_feats=ind_data_dict["valid features"],
        final_linear_layer_params=fc_params,
    )
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "react")


def get_dice_react_score_from_features(
    fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict,
    dice_percentile, react_percentile,
):
    """ReAct clip then DICE routing (reference baselines.py:146-199)."""
    print("Calculating DICE+ReAct score")
    postp = DICEReAct(
        flip_sign=False,
        dice_percentile=dice_percentile,
        react_percentile=react_percentile,
        num_classes=ind_data_dict["train logits"].shape[1],
    )
    postp.setup(
        ind_train_data=ind_data_dict["train features"],
        valid_feats=ind_data_dict["valid features"],
        final_linear_layer_params=fc_params,
    )
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "dice_react")


def get_ash_score_from_features(
    fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict, ash_percentile
):
    """ASH-S + energy (reference baselines.py:202-251)."""
    print("Calculating ash score")
    postp = ASH(flip_sign=False, ash_percentile=ash_percentile)
    postp.setup(
        ind_train_data=ind_data_dict["train features"],
        valid_feats=ind_data_dict["valid features"],
        final_linear_layer_params=fc_params,
    )
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "ash")


def get_gen_score_from_logits(
    ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict, gamma, gen_m
):
    """Generalized entropy from logits (reference baselines.py:254-298)."""
    print("Calculating GEN score")
    postp = GEN(flip_sign=False, gamma=gamma, num_classes=gen_m)
    postp.setup(ind_train_data=ind_data_dict["train logits"])
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "gen",
                         ind_input="valid logits", ood_suffix="logits")


def calculate_vim_score(
    fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict
):
    """ViM (reference baselines.py:301-352)."""
    print("Calculating ViM score")
    postp = ViM(flip_sign=False)
    postp.setup(
        ind_train_data=ind_data_dict["train features"],
        train_logits=ind_data_dict["train logits"],
        valid_feats=ind_data_dict["valid features"],
        valid_logits=ind_data_dict["valid logits"],
        final_linear_layer_params=fc_params,
    )
    ind_data_dict["vim"] = postp.postprocess(
        test_data=ind_data_dict["valid features"], logits=ind_data_dict["valid logits"]
    )
    for ood_name in ood_names:
        ood_baselines_dict[f"{ood_name} vim"] = postp.postprocess(
            test_data=ood_data_dict[f"{ood_name} features"],
            logits=ood_data_dict[f"{ood_name} logits"],
        )
    return ind_data_dict, ood_baselines_dict


def get_msp_score_from_logits(ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict):
    """MSP (reference baselines.py:355-392)."""
    print("Calculating msp score")
    postp = MSP(flip_sign=False)
    postp.setup(ind_train_data=ind_data_dict["train logits"])
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "msp",
                         ind_input="valid logits", ood_suffix="logits")


def get_raw_score_from_logits(ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict):
    """Raw MSP passthrough with no threshold (reference baselines.py:395-425)."""
    print("Calculating raw score")
    import jax.numpy as jnp

    ind_data_dict["raw"] = np.asarray(msp_score(jnp.asarray(ind_data_dict["valid logits"])))
    for ood_name in ood_names:
        ood_baselines_dict[f"{ood_name} raw"] = np.asarray(
            msp_score(jnp.asarray(ood_data_dict[f"{ood_name} logits"]))
        )
    return ind_data_dict, ood_baselines_dict


def get_energy_score_from_logits(ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict):
    """Energy (reference baselines.py:428-465)."""
    print("Calculating energy score")
    postp = Energy(flip_sign=False)
    postp.setup(ind_train_data=ind_data_dict["train logits"])
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "energy",
                         ind_input="valid logits", ood_suffix="logits")


def get_mahalanobis_score_from_features(
    ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict, num_classes
):
    """Class-conditional Mahalanobis (reference baselines.py:468-513)."""
    print("Calculating mahalanobis score")
    postp = Mahalanobis(flip_sign=False, num_classes=num_classes)
    postp.setup(
        ind_train_data=ind_data_dict["train features"],
        train_labels=ind_data_dict["train labels"],
        valid_feats=ind_data_dict["valid features"],
    )
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "mdist")


def get_knn_score_from_features(
    ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict, k_neighbors
):
    """kNN (reference baselines.py:516-563)."""
    print("Calculating knn score")
    postp = KNN(flip_sign=False, k_neighbors=k_neighbors)
    postp.setup(
        ind_train_data=ind_data_dict["train features"],
        valid_feats=ind_data_dict["valid features"],
    )
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "knn")


def get_ddu_score_from_features(
    ind_data_dict, ood_data_dict, ood_names, ood_baselines_dict, num_classes
):
    """DDU (reference baselines.py:566-611)."""
    print("Calculating ddu score")
    postp = DDU(flip_sign=False, num_classes=num_classes)
    postp.setup(
        ind_train_data=ind_data_dict["train features"],
        train_labels=ind_data_dict["train labels"],
        valid_feats=ind_data_dict["valid features"],
    )
    return _run_detector(postp, ind_data_dict, ood_data_dict, ood_names,
                         ood_baselines_dict, "ddu")


def _argmax_labels(logits) -> Optional[np.ndarray]:
    """Argmax class labels from a logits array, or None if not computable.

    21- and 11-wide logits are RCNN-style (VOC20/BDD10 + trailing background
    column); the background column is dropped before the argmax so labels
    index real classes (reference baselines.py:645-655). Empty lists (a
    dataset with zero detections) yield an empty int label array.
    """
    if isinstance(logits, np.ndarray):
        if logits.ndim == 2 and logits.shape[1] in (11, 21):
            logits = logits[:, :-1]
        return logits.argmax(axis=-1)
    if isinstance(logits, list) and not logits:
        return np.empty(0, dtype=int)
    return None


def get_labels_from_logits(
    id_data: Dict[str, np.ndarray], ood_data: Dict[str, np.ndarray], ood_names: List[str]
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Replace "... logits" entries with "... labels" argmax predictions.

    Consumes (pops) the logits arrays; missing splits get empty label arrays
    as long as at least one in-distribution split carried logits.
    """
    train_labels = _argmax_labels(id_data.pop("train logits", None))
    valid_labels = _argmax_labels(id_data.pop("valid logits", None))
    if train_labels is None and valid_labels is None:
        raise NotImplementedError(
            "in-distribution logits must be numpy arrays or empty lists"
        )
    empty = np.empty(0, dtype=int)
    id_data["train labels"] = train_labels if train_labels is not None else empty
    id_data["valid labels"] = valid_labels if valid_labels is not None else empty

    for ood_name in ood_names:
        labels = _argmax_labels(ood_data.pop(f"{ood_name} logits", None))
        if labels is None:
            raise NotImplementedError(
                f"OoD logits for {ood_name!r} must be a numpy array or an empty list"
            )
        ood_data[f"{ood_name} labels"] = labels
    return id_data, ood_data


def remove_latent_features(
    id_data: Dict[str, np.ndarray], ood_data: Dict[str, np.ndarray], ood_names: List[str]
):
    """Drop feature arrays to free memory (reference baselines.py:686-710)."""
    id_data.pop("train features", None)
    id_data.pop("valid features", None)
    for ood_name in ood_names:
        ood_data.pop(f"{ood_name} features", None)
    return id_data, ood_data


def calculate_all_baselines(
    baselines_names: List[str],
    ind_data_dict: Dict[str, np.ndarray],
    ood_data_dict: Dict[str, np.ndarray],
    fc_params: Union[Dict[str, np.ndarray], None],
    cfg,
    num_classes: int,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Compute the selected baselines (reference baselines.py:713-854).

    ``cfg`` supplies ``ood_datasets``, ``k_neighbors``, ``ash_percentile``,
    ``gen_gamma``, ``react_percentile``, ``dice_percentile``.
    """
    if num_classes > 21 and "gen" in baselines_names:
        raise ValueError(
            "Implementation of gen baseline does not yet support num_classes greater than 21. "
            "Otherwise implement M parameter specification"
        )
    ood_baselines_scores_dict: Dict[str, np.ndarray] = {}
    ood_names = list(cfg.ood_datasets)
    if "vim" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = calculate_vim_score(
            fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict
        )
    if "msp" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_msp_score_from_logits(
            ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict
        )
    if "raw" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_raw_score_from_logits(
            ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict
        )
    if "knn" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_knn_score_from_features(
            ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict,
            k_neighbors=cfg.k_neighbors,
        )
    if "energy" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_energy_score_from_logits(
            ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict
        )
    if "ash" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_ash_score_from_features(
            fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict,
            ash_percentile=cfg.ash_percentile,
        )
    if "gen" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_gen_score_from_logits(
            ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict,
            gamma=cfg.gen_gamma, gen_m=num_classes,
        )
    if "react" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_react_score_from_features(
            fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict,
            percentile=cfg.react_percentile,
        )
    if "dice" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_dice_score_from_features(
            fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict,
            percentile=cfg.dice_percentile,
        )
    if "dice_react" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_dice_react_score_from_features(
            fc_params, ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict,
            dice_percentile=cfg.dice_percentile, react_percentile=cfg.react_percentile,
        )

    ind_data_dict, ood_data_dict = get_labels_from_logits(
        id_data=ind_data_dict, ood_data=ood_data_dict, ood_names=ood_names
    )
    if "mdist" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_mahalanobis_score_from_features(
            ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict,
            num_classes=num_classes,
        )
    if "ddu" in baselines_names:
        ind_data_dict, ood_baselines_scores_dict = get_ddu_score_from_features(
            ind_data_dict, ood_data_dict, ood_names, ood_baselines_scores_dict,
            num_classes=num_classes,
        )
    return ind_data_dict, ood_data_dict, ood_baselines_scores_dict


baseline_name_dict = {
    "pred_h": {
        "plot_title": "Predictive H distribution",
        "x_axis": "Predictive H score",
        "plot_name": "pred_h",
    },
    "mi": {
        "plot_title": "Predictive MI distribution",
        "x_axis": "Predictive MI score",
        "plot_name": "pred_mi",
    },
    "msp": {
        "plot_title": "Predictive MSP distribution",
        "x_axis": "Predictive MSP score",
        "plot_name": "pred_msp",
    },
    "energy": {
        "plot_title": "Predictive energy score distribution",
        "x_axis": "Predictive energy score",
        "plot_name": "pred_energy",
    },
    "mdist": {
        "plot_title": "Mahalanobis Distance distribution",
        "x_axis": "Mahalanobis Distance score",
        "plot_name": "pred_mdist",
    },
    "knn": {
        "plot_title": "kNN distance distribution",
        "x_axis": "kNN Distance score",
        "plot_name": "pred_knn",
    },
    "ash": {
        "plot_title": "ASH score distribution",
        "x_axis": "ASH score",
        "plot_name": "ash_score",
    },
    "dice": {
        "plot_title": "DICE score distribution",
        "x_axis": "DICE score",
        "plot_name": "dice_score",
    },
    "react": {
        "plot_title": "ReAct score distribution",
        "x_axis": "ReAct score",
        "plot_name": "react_score",
    },
    "dice_react": {
        "plot_title": "DICE + ReAct score distribution",
        "x_axis": "DICE + ReAct score",
        "plot_name": "dice_react_score",
    },
    "vim": {
        "plot_title": "ViM score distribution",
        "x_axis": "ViM score",
        "plot_name": "vim_score",
    },
    "gen": {
        "plot_title": "GEN score distribution",
        "x_axis": "GEN score",
        "plot_name": "gen_score",
    },
    "ddu": {
        "plot_title": "DDU score distribution",
        "x_axis": "DDU score",
        "plot_name": "ddu_score",
    },
    "raw": {
        "plot_title": "Raw predictions",
        "x_axis": "Raw predictions",
        "plot_name": "raw_predictions",
    },
}
