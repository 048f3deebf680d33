"""Multi-chip demo: mesh-sharded fitting and data-parallel fused scoring.

Runs on any device pool — a real TPU slice, or a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python demo_multichip.py

The same code scales to pods: psum-based covariance fitting over the data
axis, sharded KDE/kNN banks, and XLA-partitioned fused LaREx scoring.
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
    variables = jax.jit(model.init)(jax.random.key(0), jnp.asarray(images[:1]))
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

    # --- 3. Sequence parallelism: exact ring attention ---
    from runia_core_tpu.parallel import ring_attention

    seq_mesh = make_mesh(n_dev, axis_names=("seq", "unused"))
    q, k, v = (jax.random.normal(jax.random.key(i), (2, 4, n_dev * 16, 32))
               for i in range(3))
    attn = ring_attention(q, k, v, seq_mesh, seq_axis="seq", causal=True)
    print(f"ring attention (sp): seq {q.shape[2]} split {n_dev}-way -> {attn.shape}")

    # --- 4. Expert parallelism: MoE FFN sharded over experts ---
    from runia_core_tpu.parallel import init_moe, moe_ffn, sharded_moe_ffn

    ep = max(d for d in (1, 2, 4) if n_dev % d == 0)
    ep_mesh = make_mesh(n_dev, model_parallel=ep)
    moe = init_moe(jax.random.key(5), 64, 128, num_experts=2 * ep)
    tokens = jax.random.normal(jax.random.key(6), (n_dev * 16, 64))
    # Ample capacity: under overflow, WHICH tokens drop is ranked per data
    # group in the sharded layer (GShard grouped routing) vs globally in the
    # dense one, so exact parity holds in the no-drop regime.
    cap = float(2 * ep)
    out_sharded = sharded_moe_ffn(moe, tokens, ep_mesh, top_k=2, capacity_factor=cap)
    out_dense = moe_ffn(moe, tokens, top_k=2, capacity_factor=cap)
    print(f"expert-parallel MoE (ep): {2 * ep} experts over {ep} devices, "
          f"max |sharded - dense| = "
          f"{float(jnp.max(jnp.abs(out_sharded - out_dense))):.2e}")

    # --- 5. Pipeline parallelism: GPipe microbatch schedule ---
    from runia_core_tpu.parallel import pipeline_apply

    pp_mesh = make_mesh(n_dev, model_parallel=n_dev)
    keys = jax.random.split(jax.random.key(7), n_dev)
    stacked = jax.vmap(lambda kk: jax.random.normal(kk, (64, 64)) * 0.2)(keys)
    block = lambda w, x: x + jnp.tanh(x @ w)
    pp_out = pipeline_apply(block, stacked, tokens, pp_mesh,
                            num_microbatches=4, stage_axis="model")
    print(f"pipeline (pp): {n_dev} stages x 4 microbatches -> {pp_out.shape}")

    # --- 6. FSDP / ZeRO-3: params + Adam moments sharded over `data` ---
    from runia_core_tpu.parallel import fsdp_train_step

    fsdp_mesh = make_mesh(n_dev, model_parallel=1)
    step = fsdp_train_step(model, fsdp_mesh, min_size=256)
    params = step.shard_params(variables["params"])
    opt = step.init_opt(params)
    lbls = shard_batch(jnp.asarray(rng.randint(0, 4, images.shape[0])),
                       fsdp_mesh)
    imgs = shard_batch(jnp.asarray(images), fsdp_mesh)
    for _ in range(3):
        params, opt, loss = step(params, opt, imgs, lbls)
    n_sharded = sum("data" in tuple(p.sharding.spec)
                    for p in jax.tree_util.tree_leaves(params))
    print(f"fsdp: loss {float(loss):.4f}, {n_sharded} param leaves sharded "
          f"1/{n_dev} per device (Adam state sharded alike)")


if __name__ == "__main__":
    main()
