"""Production serving: fit a LaREx pipeline, checkpoint it, serve a stream.

Shows the deployment shape: fit once, persist the scoring head with
``save_larex_pipeline``, then in the serving process rebuild the fused
scorer with ``load_larex_scorer`` and stream uint8 data through
``ScoringService`` (bounded in-flight window, C++ batch assembly, async
result copies). Runs on CPU or TPU unchanged.

    python examples/demo_serving.py
"""

import os as _os
import sys as _sys

# Allow `python examples/<demo>.py` from a fresh checkout (the script
# dir, not the cwd, lands on sys.path; installed packages are found).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from runia_core_tpu.checkpoint import load_larex_scorer, save_larex_pipeline
from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.inference import ScoringService, build_larex_scorer
from runia_core_tpu.models import ResNet18, build_tapped_forward
from runia_core_tpu.ops.entropy import marginal_entropy
from runia_core_tpu.reduction import apply_pca_ds_split
from runia_core_tpu.sampling import mc_dropblock_samples

BATCH, IMG, MC = 64, 32, 8


def main():
    rng = np.random.RandomState(0)
    model = ResNet18(num_classes=10, cifar_stem=True)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    )
    forward = build_tapped_forward(model, variables, taps=("pre_pool",))

    # ---- offline: fit the scoring head on InD training data ----
    imgs = jnp.asarray(rng.rand(256, IMG, IMG, 3).astype(np.float32))
    _, taps = forward(imgs)
    mc = mc_dropblock_samples(
        jax.random.key(1), taps["pre_pool"], MC, 3, 0.5, "Conv", channel_axis=3
    )
    h_train = np.asarray(marginal_entropy(mc, 5))
    h_pca, pca_state = apply_pca_ds_split(h_train, nro_components=64)
    larem = MDLatentSpace()
    larem.setup(h_pca)

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        save_larex_pipeline(
            f.name, pca_state, larem.state, mcd_samples_nro=MC,
            drop_block_prob=0.5, drop_block_size=3,
        )
        print(f"pipeline head checkpointed -> {f.name}")

        # ---- serving process: rebuild + stream ----
        scorer = load_larex_scorer(f.name, forward)
        service = ScoringService(scorer, key=jax.random.key(7))
        dataset_u8 = (rng.rand(5 * BATCH + 17, IMG, IMG, 3) * 255).astype(
            np.uint8
        )
        logits, scores = service.score_dataset(dataset_u8, batch_size=BATCH)
        print(
            f"served {scores.shape[0]} images: "
            f"score mean={scores.mean():.3f} std={scores.std():.3f}"
        )
        threshold = float(np.mean(scores) - 1.645 * np.std(scores))
        print(f"z-score OoD threshold (mu - 1.645 sigma): {threshold:.3f}")
        print(f"flagged OoD: {(scores < threshold).sum()} / {len(scores)}")


if __name__ == "__main__":
    main()
