"""Image-level LaREx demo: the flagship OoD-detection flow, end to end.

Model -> feature tap -> vmapped 16-sample MC-DropBlock -> per-dimension KL
entropy -> PCA -> LaREM/LaRED -> AUROC + online scoring, on synthetic data
(fully offline). Swap in your own flax model + datasets via the same APIs.
"""

import os as _os
import sys as _sys

# Allow `python examples/<demo>.py` from a fresh checkout (the script
# dir, not the cwd, lands on sys.path; installed packages are found).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from runia_core_tpu.config import default_config
from runia_core_tpu.detectors import LaREMPostprocessor
from runia_core_tpu.evaluation import get_dl_h_z, log_evaluate_larex
from runia_core_tpu.extraction import FastMCDSamplesExtractor
from runia_core_tpu.inference import LaRExInference, build_larex_scorer
from runia_core_tpu.models import ResNet18, build_tapped_forward
from runia_core_tpu.reduction import apply_pca_ds_split, apply_pca_transform
from runia_core_tpu.utils import benchmark

MC_SAMPLES = 16
IMG = 32
BATCH = 64


def batches(x, bs=BATCH):
    for i in range(0, len(x), bs):
        yield x[i : i + bs], np.zeros(len(x[i : i + bs]))


def main():
    rng = np.random.RandomState(0)
    model = ResNet18(num_classes=10, cifar_stem=True)
    init = jnp.zeros((BATCH, IMG, IMG, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), init)
    forward = build_tapped_forward(model, variables, taps=("pre_pool",))

    # Synthetic InD/OoD data (replace with CIFAR-10 / SVHN loaders)
    x_train = rng.rand(256, IMG, IMG, 3).astype(np.float32)
    x_ind = rng.rand(128, IMG, IMG, 3).astype(np.float32)
    x_ood = (rng.rand(128, IMG, IMG, 3) * 2 - 0.5).astype(np.float32)

    extractor = FastMCDSamplesExtractor(
        model=forward, layer_type="Conv", reduction_method="fullmean",
        mcd_nro_samples=MC_SAMPLES, dropblock_probs=0.5, dropblock_sizes=3,
    )
    print("Extracting MC latent samples...")
    train_s = extractor.get_ls_samples(batches(x_train))
    ind_s = extractor.get_ls_samples(batches(x_ind))
    ood_s = extractor.get_ls_samples(batches(x_ood))

    print("Computing KL entropies...")
    _, h_train = get_dl_h_z(train_s["latent_space_means"], MC_SAMPLES)
    _, h_ind = get_dl_h_z(ind_s["latent_space_means"], MC_SAMPLES)
    _, h_ood = get_dl_h_z(ood_s["latent_space_means"], MC_SAMPLES)

    # Full evaluation sweep: baselines skipped, LaRED/LaREM with a PCA sweep
    cfg = default_config(
        ood_datasets=["shifted"], ind_dataset="synthetic",
        n_pca_components=[32, 64],
    )
    df, best, thresholds, _ = log_evaluate_larex(
        cfg=cfg,
        baselines_names=[],
        ood_baselines_scores={},
        ind_data_dict={
            "train latent_space_means": h_train,
            "valid latent_space_means": h_ind,
        },
        ood_data_dict={"shifted latent_space_means": h_ood},
        mlflow_run_name="demo",
        mlflow_logging=False,
        postprocessors=["LaRED", "LaREM"],
    )
    print(df[["auroc", "fpr@95", "aupr"]])
    print("Best:", {k: v for k, v in best.items() if k != "best"})

    # Online scoring: one fused jitted program
    h_train_pca, pca = apply_pca_ds_split(h_train, nro_components=64)
    larem = LaREMPostprocessor()
    larem.setup(h_train_pca)
    scorer = build_larex_scorer(
        forward, pca_state=pca, detector_state=larem.state,
        mcd_samples_nro=MC_SAMPLES, drop_block_prob=0.5, drop_block_size=3,
    )
    (logits, scores), dt = benchmark(
        scorer, jnp.asarray(x_ind[:BATCH]), jax.random.key(1)
    )
    print(f"Fused LaREx scoring: {BATCH / dt:.0f} images/sec "
          f"({np.asarray(scores)[:4].round(2)} ...)")


if __name__ == "__main__":
    main()
