"""Segmentation uncertainty demo: DeepLabv3+ on TPU.

Two flows:
  1. Dense per-pixel MC-dropout maps (pred_h / MI / MSP) through the fused
     `build_pixel_uncertainty_scorer` program — the production anomaly-
     segmentation signal.
  2. The reference's image-level flow (`deeplabv3p_get_ls_mcd_samples`,
     reference image_level.py:580-631): ASPP channel means -> KL entropy ->
     LaREM score per image.
"""

import os as _os
import sys as _sys

# Allow `python examples/<demo>.py` from a fresh checkout (the script
# dir, not the cwd, lands on sys.path; installed packages are found).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.inference import build_pixel_uncertainty_scorer
from runia_core_tpu.models import DeepLabV3Plus
from runia_core_tpu.models.resnet import ResNetBlock

BATCH, IMG, MC = 4, 128, 8


def main():
    rng = np.random.RandomState(0)
    model = DeepLabV3Plus(
        num_classes=12,
        backbone_stages=(2, 2, 2, 2),
        backbone_block=ResNetBlock,
        num_filters=32,
        output_stride=16,
        aspp_features=128,
        dropout_rate=0.5,
        dtype=jnp.bfloat16,
    )
    variables = jax.jit(lambda k, x: model.init(k, x))(
        jax.random.key(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    )

    # --- 1. Per-pixel MC-dropout uncertainty maps ---
    def stochastic(images, key):
        return model.apply(variables, images, rngs={"dropout": key})

    scorer = build_pixel_uncertainty_scorer(stochastic, mc_samples=MC)
    images = jnp.asarray(rng.rand(BATCH, IMG, IMG, 3).astype(np.float32))
    maps = scorer(images, jax.random.key(1))
    print("per-pixel maps:", {k: tuple(v.shape) for k, v in maps.items()})
    print(
        f"  mean pred_h {float(np.mean(np.asarray(maps['pred_h']))):.3f}  "
        f"mean MI {float(np.mean(np.asarray(maps['mi']))):.4f}  "
        f"mean MSP {float(np.mean(np.asarray(maps['msp']))):.3f}"
    )

    # --- 2. Reference image-level LaREx flow on the ASPP tap ---
    # The MC noise goes ON the tap (DropBlock replay, reference
    # image_level.py:186-242) — the fused scorer works for segmentation
    # backbones exactly as for classifiers.
    from runia_core_tpu.inference import build_larex_scorer
    from runia_core_tpu.ops.entropy import marginal_entropy
    from runia_core_tpu.reduction import apply_pca_ds_split
    from runia_core_tpu.sampling import mc_dropblock_samples

    fwd = jax.jit(lambda x: model.apply(variables, x))
    fit_imgs = jnp.asarray(rng.rand(4 * BATCH, IMG, IMG, 3).astype(np.float32))
    h_list = []
    for i in range(0, 4 * BATCH, BATCH):
        _, taps = fwd(fit_imgs[i : i + BATCH])
        mc = mc_dropblock_samples(
            jax.random.fold_in(jax.random.key(3), i),
            taps["pre_pool"].astype(jnp.float32), MC, 3, 0.5, "Conv",
            channel_axis=3,
        )
        h_list.append(np.asarray(marginal_entropy(mc, 5)))
    h_train_pca, pca_state = apply_pca_ds_split(
        np.concatenate(h_list), nro_components=8
    )
    md = MDLatentSpace()
    md.setup(h_train_pca)
    scorer = build_larex_scorer(
        fwd, pca_state=pca_state,
        detector_state={"feats_mean": md.feats_mean, "precision": md.precision},
        mcd_samples_nro=MC,
    )
    shifted = jnp.asarray(
        (rng.rand(BATCH, IMG, IMG, 3) * 2.0 - 0.5).astype(np.float32)
    )
    _, s_ind = scorer(images, jax.random.key(4))
    _, s_shift = scorer(shifted, jax.random.key(5))
    print("image-level LaREM (InD):   ", np.round(np.asarray(s_ind), 2))
    print("image-level LaREM (shift): ", np.round(np.asarray(s_shift), 2))


if __name__ == "__main__":
    main()
