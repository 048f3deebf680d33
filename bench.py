"""Headline benchmark: OoD-scored images/sec/chip for the full LaREx pipeline.

Pipeline (BASELINE.md target config): ResNet-18 (CIFAR stem) forward ->
16-sample MC-DropBlock on the pre-pool feature map -> per-dimension
Kozachenko-Leonenko entropy (512 dims) -> PCA-256 -> LaREM (Mahalanobis)
score. Ours runs as ONE fused jitted XLA program per batch on the TPU
(runia_core_tpu.inference.build_larex_scorer).

``vs_baseline`` compares against a reference-equivalent CPU pipeline built
from the same libraries the PyTorch reference uses (torch forward, per-image
DropBlock replay, scipy-cKDTree per-dimension entropy, sklearn PCA + numpy
Mahalanobis — see /root/reference/runia_core/inference/image_level.py:96-120
for the flow being mirrored). The baseline measures steady-state per-image
scoring latency on this host's CPU.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("RUNIA_BENCH_BATCH", 512))
# Forward-pass dtype. bf16 is the production config (MXU-native, +23% over
# f32 on v5e); the tap activations are cast to f32 before the scoring stack,
# whose numerics (entropy/PCA/Mahalanobis) always run in f32 — the AUROC
# parity gates in tests/ pin the f32 scoring path. Set
# RUNIA_BENCH_DTYPE=float32 for the bit-conservative forward.
DTYPE = os.environ.get("RUNIA_BENCH_DTYPE", "bfloat16")
MC_SAMPLES = 16
PCA_DIMS = 256
NUM_CLASSES = 10
IMG = 32
DROP_PROB = 0.5
BLOCK_SIZE = 3
N_FIT = 640  # images used to fit PCA + LaREM
BASELINE_IMAGES = 4  # single-core CPU reference is slow; 4 is enough to time


def build_pipeline():
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.detectors import MDLatentSpace
    from runia_core_tpu.evaluation import get_dl_h_z
    from runia_core_tpu.inference import build_larex_scorer
    from runia_core_tpu.models import ResNet18, build_tapped_forward
    from runia_core_tpu.reduction import apply_pca_ds_split
    from runia_core_tpu.sampling import mc_dropblock_samples
    from runia_core_tpu.ops.entropy import marginal_entropy

    rng = np.random.RandomState(0)
    model = ResNet18(
        num_classes=NUM_CLASSES, cifar_stem=True, dtype=getattr(jnp, DTYPE)
    )
    init_images = jnp.zeros((BATCH, IMG, IMG, 3), jnp.float32)
    variables = model.init(jax.random.key(0), init_images)
    forward = build_tapped_forward(model, variables, taps=("pre_pool",))

    # ---- fit: entropies of InD train data -> PCA-256 -> LaREM ----
    key = jax.random.key(1)
    h_list = []
    for i in range(0, N_FIT, BATCH):
        imgs = jnp.asarray(rng.rand(BATCH, IMG, IMG, 3).astype(np.float32))
        _, taps = forward(imgs)
        mc = mc_dropblock_samples(
            jax.random.fold_in(key, i), taps["pre_pool"], MC_SAMPLES,
            BLOCK_SIZE, DROP_PROB, "Conv", channel_axis=3,
        )
        h_list.append(np.asarray(marginal_entropy(mc, 5)))
    h_train = np.concatenate(h_list, axis=0)
    h_train_pca, pca_state = apply_pca_ds_split(h_train, nro_components=PCA_DIMS)
    larem = MDLatentSpace()
    larem.setup(h_train_pca)

    scorer = build_larex_scorer(
        forward,
        pca_state=pca_state,
        detector_state={"feats_mean": larem.feats_mean, "precision": larem.precision},
        mcd_samples_nro=MC_SAMPLES,
        drop_block_prob=DROP_PROB,
        drop_block_size=BLOCK_SIZE,
    )
    return scorer, rng


def measure_tpu():
    import jax
    import jax.numpy as jnp

    scorer, rng = build_pipeline()
    key = jax.random.key(7)
    images = jnp.asarray(rng.rand(BATCH, IMG, IMG, 3).astype(np.float32))
    # warmup / compile (two rounds so autotuning settles)
    for i in range(2):
        logits, scores = scorer(images, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(scores)
    # Steady-state pipelined throughput: long windows amortize the one
    # host<->device sync per window (~30 ms over the tunnel), and the
    # per-batch RNG keys are derived up front so key folding is not in the
    # timed loop. Median over windows is robust to tunnel hiccups.
    iters = 200
    n_windows = 3
    keys = [jax.random.fold_in(key, i) for i in range(n_windows * iters)]
    jax.block_until_ready(keys[-1])
    windows = []
    for w in range(n_windows):
        t0 = time.perf_counter()
        for i in range(iters):
            _, scores = scorer(images, keys[w * iters + i])
        jax.block_until_ready(scores)
        windows.append(BATCH * iters / (time.perf_counter() - t0))
    return float(np.median(windows))


# ---------------------------------------------------------------------------
# Reference-equivalent CPU baseline (torch + scipy + sklearn + numpy)
# ---------------------------------------------------------------------------
def _torch_resnet18(num_classes):
    """Minimal torch ResNet-18 (CIFAR stem) exposing the pre-pool map."""
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
                )

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64), nn.ReLU()
            )
            layers = []
            cin = 64
            for i, cout in enumerate([64, 128, 256, 512]):
                stride = 1 if i == 0 else 2
                layers += [BasicBlock(cin, cout, stride), BasicBlock(cout, cout)]
                cin = cout
            self.blocks = nn.Sequential(*layers)
            self.head = nn.Linear(512, num_classes)

        def forward(self, x):
            fmap = self.blocks(self.stem(x))  # (B, 512, H, W) pre-pool
            out = self.head(fmap.mean(dim=(2, 3)))
            return out, fmap

    return Net().eval()


def _cpu_dropblock(x, drop_prob, block_size, rng):
    """dropblock-package semantics on a (1, C, H, W) torch tensor."""
    import torch
    import torch.nn.functional as F

    gamma = drop_prob / block_size**2
    b, _, h, w = x.shape
    mask = torch.from_numpy((rng.rand(b, h, w) < gamma).astype(np.float32))
    block = F.max_pool2d(mask[:, None], block_size, 1, block_size // 2)
    if block_size % 2 == 0:
        block = block[:, :, :-1, :-1]
    keep = 1 - block.squeeze(1)
    return x * keep[:, None] * keep.numel() / keep.sum()


def measure_cpu_reference():
    """Steady-state per-image latency of the reference fast-LaREx flow on CPU."""
    import torch
    from scipy.spatial import cKDTree
    from scipy.special import digamma
    from sklearn.decomposition import PCA

    torch.set_num_threads(max(1, len(os.sched_getaffinity(0))))
    rng = np.random.RandomState(0)
    net = _torch_resnet18(NUM_CLASSES)

    def kl_entropy_1d(col):
        tree = cKDTree(col[:, None])
        dist = tree.query(col[:, None], 6, p=np.inf)[0][:, -1]
        dist[dist < 1e-5] = 1e-5
        n = len(col)
        return -digamma(5) + digamma(n) + np.sum(np.log(2 * dist)) / n

    # Fit PCA + MD on a few CPU-extracted entropy vectors (fit cost excluded).
    fit_vecs = []
    with torch.no_grad():
        for _ in range(max(PCA_DIMS + 1, 8) // 8):  # keep fit sane on 1 core
            break
    # PCA needs > PCA_DIMS samples; fitting 257 CPU images is infeasible on one
    # core, so fit on synthetic entropy vectors — fit cost is NOT part of the
    # measured inference latency and does not affect it.
    h_fit = rng.rand(PCA_DIMS + 64, 512).astype(np.float64)
    pca = PCA(n_components=PCA_DIMS, svd_solver="randomized", whiten=True).fit(h_fit)
    h_fit_t = pca.transform(h_fit)
    mean = h_fit_t.mean(0, keepdims=True)
    from sklearn.covariance import EmpiricalCovariance

    prec = EmpiricalCovariance().fit(h_fit_t - mean).precision_

    times = []
    with torch.no_grad():
        for i in range(BASELINE_IMAGES + 1):
            img = torch.from_numpy(rng.rand(1, 3, IMG, IMG).astype(np.float32))
            t0 = time.perf_counter()
            _, fmap = net(img)
            samples = []
            for s in range(MC_SAMPLES):
                noised = _cpu_dropblock(fmap, DROP_PROB, BLOCK_SIZE, rng)
                samples.append(noised.mean(dim=(2, 3)).numpy()[0])
            cloud = np.stack(samples)  # (16, 512)
            h_z = np.array([kl_entropy_1d(cloud[:, d]) for d in range(cloud.shape[1])])
            h_pca = pca.transform(h_z[None])
            diff = h_pca - mean
            _score = -np.diag(diff @ prec @ diff.T)
            dt = time.perf_counter() - t0
            if i > 0:  # discard first (warmup/allocs)
                times.append(dt)
    return 1.0 / float(np.mean(times))


def main():
    tpu_ips = measure_tpu()
    try:
        cpu_ips = measure_cpu_reference()
    except Exception as exc:  # pragma: no cover
        print(f"baseline measurement failed: {exc}", file=sys.stderr)
        cpu_ips = None
    vs = (tpu_ips / cpu_ips) if cpu_ips else None
    print(
        json.dumps(
            {
                "metric": "ood_scored_images_per_sec_per_chip",
                "value": round(tpu_ips, 2),
                "unit": (
                    "img/s (LaREx: ResNet-18 "
                    + ("bf16" if "bf" in DTYPE else "f32")
                    + " + 16xMC-DropBlock + entropy-512 + PCA-256 + LaREM, f32 scoring)"
                ),
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
