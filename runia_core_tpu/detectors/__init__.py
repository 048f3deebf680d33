"""Post-hoc OoD detectors (the reference's "postprocessors" layer).

Importing this package populates the registry ``postprocessors_dict`` /
``postprocessor_input_dict`` exactly like the reference
(runia_core/inference/postprocessors.py:37-75), plus LaRED/LaREM/LaREK/LaREG
aliases for the README-facing names.
"""

from runia_core_tpu.detectors.base import (
    OodPostprocessor,
    Postprocessor,
    get_baselines_thresholds,
    get_method_threshold,
    postprocessor_input_dict,
    postprocessors_dict,
    record_time,
    register_postprocessor,
)
from runia_core_tpu.detectors.funcs import (
    RouteDICE,
    ash_s_conv_layer,
    ash_s_linear_layer,
    dice_masked_weight,
    generalized_entropy,
    get_dice_feat_mean_react_percentile,
    get_mcd_pred_uncertainty_score,
    get_predictive_uncertainty_score,
    gmm_fit,
    mahalanobis_postprocess,
    mahalanobis_preprocess,
    normalizer,
    route_dice_logits,
)
from runia_core_tpu.detectors.latent import (
    DetectorKDE,
    GMMLatentSpace,
    KDELatentSpace,
    KNNLatentSpace,
    LaREDPostprocessor,
    LaREGPostprocessor,
    LaREKPostprocessor,
    LaREMPostprocessor,
    MDLatentSpace,
    cMDLatentSpace,
)
from runia_core_tpu.detectors.logits import GEN, MSP, Energy
from runia_core_tpu.detectors.features import (
    ASH,
    DDU,
    DICE,
    DICEReAct,
    KNN,
    Mahalanobis,
    ReAct,
    ViM,
)

__all__ = [
    "Postprocessor",
    "OodPostprocessor",
    "postprocessors_dict",
    "postprocessor_input_dict",
    "register_postprocessor",
    "record_time",
    "get_baselines_thresholds",
    "get_method_threshold",
    # latent
    "DetectorKDE",
    "KDELatentSpace",
    "MDLatentSpace",
    "cMDLatentSpace",
    "KNNLatentSpace",
    "GMMLatentSpace",
    "LaREDPostprocessor",
    "LaREMPostprocessor",
    "LaREKPostprocessor",
    "LaREGPostprocessor",
    # logits
    "Energy",
    "MSP",
    "GEN",
    # features
    "DDU",
    "KNN",
    "Mahalanobis",
    "ViM",
    "ASH",
    "DICE",
    "ReAct",
    "DICEReAct",
    # funcs
    "mahalanobis_preprocess",
    "mahalanobis_postprocess",
    "normalizer",
    "RouteDICE",
    "gmm_fit",
    "generalized_entropy",
    "ash_s_linear_layer",
    "ash_s_conv_layer",
    "dice_masked_weight",
    "route_dice_logits",
    "get_predictive_uncertainty_score",
    "get_mcd_pred_uncertainty_score",
    "get_dice_feat_mean_react_percentile",
]
