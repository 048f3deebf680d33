"""Multi-chip demo: mesh-sharded fitting and data-parallel fused scoring.

Runs on any device pool — a real TPU slice, or a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python demo_multichip.py

The same code scales to pods: psum-based covariance fitting over the data
axis, sharded KDE/kNN banks, and XLA-partitioned fused LaREx scoring.
"""

import numpy as np
import jax
import jax.numpy as jnp

from runia_core_tpu.detectors import MDLatentSpace
from runia_core_tpu.detectors.latent import md_score
from runia_core_tpu.inference import build_larex_scorer
from runia_core_tpu.models import SimpleConvNet, build_tapped_forward
from runia_core_tpu.parallel import make_mesh, shard_batch
from runia_core_tpu.parallel.sharded import data_parallel_scorer, fit_md_sharded
from runia_core_tpu.utils import benchmark


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, model_parallel=1)
    print(f"mesh: {mesh.shape} over {jax.devices()[0].platform}")

    rng = np.random.RandomState(0)

    # --- 1. Fit LaREM over a train set sharded across the data axis ---
    train = rng.randn(8192, 64).astype(np.float32)
    train_sharded = shard_batch(jnp.asarray(train), mesh)
    state = fit_md_sharded(train_sharded, mesh)
    print("sharded-fit precision:", state["precision"].shape)

    # Single-device check
    md = MDLatentSpace()
    md.setup(train)
    test = rng.randn(256, 64).astype(np.float32)
    sharded_scores = np.asarray(
        md_score(jnp.asarray(test), state["feats_mean"], state["precision"])
    )
    single_scores = md.postprocess(test)
    print("fit parity (max abs diff):",
          float(np.abs(sharded_scores - single_scores).max()))

    # --- 2. Data-parallel fused LaREx scoring ---
    model = SimpleConvNet(num_classes=4, features=16)  # pre_pool has 32 ch
    images = rng.rand(n_dev * 32, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(images[:1]))
    forward = build_tapped_forward(model, variables)
    md_entropy = MDLatentSpace()
    md_entropy.setup(rng.randn(512, 32).astype(np.float32))
    scorer = build_larex_scorer(
        forward, pca_state=None, detector_state=md_entropy.state,
        mcd_samples_nro=8, drop_block_prob=0.4, drop_block_size=3,
    )
    dp_scorer = data_parallel_scorer(scorer, mesh)
    (logits, scores), dt = benchmark(dp_scorer, jnp.asarray(images), jax.random.key(1))
    print(f"data-parallel LaREx over {n_dev} devices: "
          f"{images.shape[0] / dt:.0f} img/s (batch {images.shape[0]})")


if __name__ == "__main__":
    main()
