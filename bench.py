"""Benchmark suite: one JSON line, headline + per-subsystem metrics with MFU.

Headline (the driver contract's metric/value/unit/vs_baseline keys):
OoD-scored images/sec/chip for the full LaREx pipeline — ResNet-18 (CIFAR
stem) forward -> 16-sample MC-DropBlock on the pre-pool feature map ->
per-dimension Kozachenko-Leonenko entropy (512 dims) -> PCA-256 -> LaREM
(Mahalanobis) score, ONE fused jitted XLA program per batch
(runia_core_tpu.inference.build_larex_scorer).

The "suite" key carries the wider matrix (VERDICT.md round-1 item 4 +
round-2 item 1):
  - larex_resnet18_32px   headline config, with achieved TFLOP/s + MFU
  - larex_resnet50_224px  production-shape LaREx (entropy-2048, PCA-256)
  - object_scorer         batched object-level path (128 imgs x 20 dets,
                          RoI-align + LaREM per detection)
  - llama1b_prefill       flash prefill, 8 x 1024 tokens on a ~1.17B Llama
  - llama1b_decode_greedy batched KV-cache decode (16 x 256) with achieved
                          HBM GB/s vs the 819 GB/s v5e peak (decode is
                          bandwidth-bound; FLOP-MFU is the wrong lens)
  - llama1b_decode_int8kv8  same with int8 weights + int8 KV cache
  - llama1b_serving_96req  96 mixed requests through the batching
                          engine, best of the fused on-device drain (one
                          while_loop, zero per-chunk host round trips) and
                          the lookahead-pipelined interactive drain, vs
                          static batching
  - llama1b_speculative   fused draft/verify with a layer-truncated
                          correlated draft; reports measured acceptance

MFU is achieved-FLOPs / v5e bf16 peak (197 TFLOP/s). FLOPs per call come
from XLA's compiled cost analysis when the backend exposes it, else from the
analytic fallbacks noted inline.

``vs_baseline`` compares the headline against the reference-equivalent CPU
pipeline built from the libraries the PyTorch reference delegates to (torch
forward, per-image DropBlock replay, scipy-cKDTree entropy, sklearn PCA +
numpy Mahalanobis — /root/reference/runia_core/inference/image_level.py:96-120).
That baseline is PINNED (measured once on an idle host, 2026-08-17) so the
ratio does not wobble with host load; set RUNIA_MEASURE_BASELINE=1 to
re-measure live instead.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", "suite"}.
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
BASELINE_IMAGES = 4  # single-core CPU reference is slow; 4 is enough to time

# Reference-equivalent CPU pipeline, steady-state per-image scoring rate on
# this host (img/s), measured 2026-08-17 via measure_cpu_reference() on an
# otherwise idle machine (best of 6 runs: 18.9-22.0; the best is pinned so
# vs_baseline is conservative and stable across host-load conditions).
PINNED_CPU_BASELINE_IPS = 22.0
V5E_BF16_PEAK_FLOPS = 197e12


def _aot_compile(jitted_fn, *args):
    """AOT-compile once; returns (callable, flops or None).

    The AOT executable is reused for the timed calls so cost analysis does
    NOT pay a second 30-60s remote compile over the tunnel (the jit cache
    and .lower().compile() don't share executables).
    """
    try:
        compiled = jitted_fn.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return compiled, float(cost["flops"])
    except Exception:
        return jitted_fn, None


def _sync(out):
    """Drain the device queue with one tiny host fetch (the library's
    canonical recipe — one copy of the load-bearing tunneled-TPU timing
    logic, not a fork of it)."""
    from runia_core_tpu.utils.profiling import sync

    sync(out)


def _timed_rate(fn, per_call, iters, windows=3):
    """Median steady-state rate (per_call units / s) via the library's
    marginal-window benchmark (fixed costs — RTT, drain latency, fetch —
    cancel between the paired windows; the median over ``windows`` pairs
    rides out tunnel jitter). Two warmup rounds so autotuning settles."""
    from runia_core_tpu.utils.profiling import benchmark

    _, sec = benchmark(fn, iters=iters, warmup=2, windows=windows)
    return float(per_call / sec)


def build_larex(img, batch, resnet50=False, int8=False):
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.detectors import MDLatentSpace
    from runia_core_tpu.inference import build_larex_scorer
    from runia_core_tpu.models import (
        ResNet18,
        ResNet50,
        build_tapped_forward,
        quantize_resnet,
    )
    from runia_core_tpu.reduction import apply_pca_ds_split
    from runia_core_tpu.sampling import mc_dropblock_samples
    from runia_core_tpu.ops.entropy import marginal_entropy

    rng = np.random.RandomState(0)
    dtype = getattr(jnp, DTYPE)
    if resnet50:
        model = ResNet50(num_classes=NUM_CLASSES, dtype=dtype)
    else:
        model = ResNet18(num_classes=NUM_CLASSES, cifar_stem=True, dtype=dtype)
    init_images = jnp.zeros((batch, img, img, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), init_images)
    forward = build_tapped_forward(model, variables, taps=("pre_pool",))
    if int8:
        # PTQ backbone (models/quant_vision.py): int8 convs on the MXU; the
        # scoring stack (entropy/PCA/LaREM) stays f32. The fit loop below
        # then runs on this quantized forward too — fit on the path you
        # serve, so the PCA/LaREM state matches the features it will score.
        calib = rng.rand(min(batch, 256), img, img, 3).astype(np.float32)
        forward = quantize_resnet(model, variables, calib)

    # ---- fit: entropies of InD train data -> PCA-256 -> LaREM ----
    key = jax.random.key(1)
    n_fit = max(batch, ((PCA_DIMS + 64) // batch + 1) * batch)
    h_list = []
    for i in range(0, n_fit, batch):
        imgs = jnp.asarray(rng.rand(batch, img, img, 3).astype(np.float32))
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


def measure_larex(img, batch, resnet50, iters, analytic_flops_per_img, int8=False):
    import jax
    import jax.numpy as jnp

    scorer, rng = build_larex(img, batch, resnet50=resnet50, int8=int8)
    key = jax.random.key(7)
    images = jnp.asarray(rng.rand(batch, img, img, 3).astype(np.float32))
    keys = [jax.random.fold_in(key, i) for i in range(3 * iters + 8)]
    jax.block_until_ready(keys[-1])
    run, flops = _aot_compile(scorer, images, keys[0])
    if flops is None:
        flops = analytic_flops_per_img * batch

    counter = {"i": 0}

    def call():
        counter["i"] += 1
        _, scores = run(images, keys[counter["i"] % len(keys)])
        return scores

    ips = _timed_rate(call, batch, iters)
    tflops = flops / batch * ips / 1e12
    return ips, tflops, tflops * 1e12 / V5E_BF16_PEAK_FLOPS


def measure_objects():
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.detectors import MDLatentSpace
    from runia_core_tpu.extraction import build_object_scorer, pad_detections
    from runia_core_tpu.models import ResNet18, build_tapped_forward

    # Batch 128: the RN18@256 forward (which dominates this program — the
    # ROI+score stages cost 0.17 ms, see benchmarks/profile_object_scorer)
    # is HBM-bound, and doubling the batch amortizes the weight reads:
    # 18.3 vs 30.5 MB/img measured, 1.53x forward throughput over b=64.
    b, img, max_det = 128, 256, 20
    rng = np.random.RandomState(0)
    model = ResNet18(num_classes=10, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((b, img, img, 3)))
    forward = build_tapped_forward(model, variables, taps=("pre_pool",))
    md = MDLatentSpace()
    md.setup(rng.randn(1024, 512).astype(np.float32))

    def make_dets(n):
        xy = rng.rand(n, 2) * (img - 40)
        wh = rng.rand(n, 2) * 30 + 8
        return {
            "boxes": np.concatenate([xy, xy + wh], 1).astype(np.float32),
            "scores": rng.rand(n).astype(np.float32),
            "classes": rng.randint(0, 10, n),
        }

    padded = pad_detections([make_dets(max_det) for _ in range(b)],
                            max_det, (img, img))
    scorer = build_object_scorer(forward, md.state, output_sizes=(7,),
                                 img_shape=(img, img))
    images = jnp.asarray(rng.rand(b, img, img, 3).astype(np.float32))
    run, flops = _aot_compile(scorer, images, padded)
    dps = _timed_rate(lambda: run(images, padded), b * max_det, 30)
    tflops = (flops / (b * max_det) * dps / 1e12) if flops else None
    mfu = (tflops * 1e12 / V5E_BF16_PEAK_FLOPS) if tflops else None
    return dps, tflops, mfu


V5E_HBM_PEAK_BYTES = 819e9  # v5e HBM bandwidth (one chip)

# Production-size Llama for the serving legs: ~1.17B params (22L, d=2048,
# GQA 16q/8kv, ffn 5632, vocab 32k) — the largest round-number config that
# leaves room for batch-16 KV cache + compile workspace on one 16 GB v5e.
# Weights are STORED bf16 (2.34 GB) so the decode-bandwidth numbers reflect
# the production layout, not flax's f32 default param dtype.
_PROD_CFG = dict(vocab_size=32000, num_layers=22, num_heads=16,
                 num_kv_heads=8, d_model=2048, hidden_dim=5632, max_len=2048)
_PROD_CACHE = {}


def _get_prod_llama():
    """Init (once) the production Llama on-device; returns a state dict."""
    if _PROD_CACHE:
        return _PROD_CACHE
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.models import LlamaLM

    model = LlamaLM(**_PROD_CFG, dtype=jnp.bfloat16, use_flash=True)
    params = jax.jit(model.init)(jax.random.key(0), np.zeros((1, 8), np.int32))
    # Store weights bf16 (production serving layout; halves decode HBM).
    params = jax.jit(
        lambda p: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p
        )
    )(params)
    leaves = jax.tree_util.tree_leaves(params)
    _PROD_CACHE.update(
        model=model,
        params=params,
        n_params=sum(int(np.prod(p.shape)) for p in leaves),
        weight_bytes=sum(p.size * p.dtype.itemsize for p in leaves),
    )
    return _PROD_CACHE


def measure_llm_prefill():
    """Flash prefill on the production model: batch 8 x 1024 tokens, logits
    sliced to the last position (what JaxGenerator's prefill consumes)."""
    import jax
    import jax.numpy as jnp

    st = _get_prod_llama()
    b, t = 8, 1024
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(1, 32000, (b, t)), jnp.int32
    )
    fwd = jax.jit(lambda p, tok: st["model"].apply(p, tok)[0][:, -1])
    compiled, flops = _aot_compile(fwd, st["params"], tokens)
    tps = _timed_rate(lambda: compiled(st["params"], tokens), b * t, iters=6)
    if flops is None:
        # Analytic: 2*N_params matmul FLOPs/token + causal attention.
        flops = 2 * st["n_params"] * b * t + 2 * 2 * b * _PROD_CFG[
            "num_layers"] * t * t * _PROD_CFG["d_model"] / 2
    achieved = tps / (b * t) * flops
    return tps, achieved / 1e12, achieved / V5E_BF16_PEAK_FLOPS


def _decode_leg(int8: bool):
    """Greedy batched decode on the production model. Decode is HBM-bound,
    so the utilization metric is achieved bytes/s vs the 819 GB/s v5e peak:
    every step reads the full weights once plus each sequence's KV cache."""
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.llm import JaxGenerator
    from runia_core_tpu.models import LlamaLM, quantize_llama_params

    st = _get_prod_llama()
    # 256 new tokens: the decode-phase steady state. At 64 the fixed
    # per-pass costs (prefill + tunnel fetch, ~115 ms) eat ~35% of the
    # window and under-report the decode engine; a decode-only 64-step
    # scan measures 3.59 ms/step = 84% of the HBM peak
    # (benchmarks/profile_decode.py, 2026-08-19), and 256-token
    # generations amortize the pass overhead to <10%.
    b, prompt_len, max_new = 16, 64, 256
    if int8:
        from runia_core_tpu.models import fuse_quantized_llama_params

        # Fused qkv/gateup int8 layout: 4 dequant-matmul launches per
        # layer instead of 7 (the per-step launch count is the quantized
        # decode's fixed floor; numerics bit-identical).
        model = LlamaLM(**_PROD_CFG, dtype=jnp.bfloat16, use_flash=True,
                        quantized=True, quantized_kv=True, fused_qkv=True)
        params = jax.jit(fuse_quantized_llama_params)(
            quantize_llama_params(st["params"], on_device=True)
        )
        leaves = jax.tree_util.tree_leaves(params)
        weight_bytes = sum(p.size * p.dtype.itemsize for p in leaves)
        kv_itemsize = 1
    else:
        model, params = st["model"], st["params"]
        weight_bytes = st["weight_bytes"]
        kv_itemsize = 2
    gen = JaxGenerator(model, params, max_new_tokens=max_new)
    rng = np.random.RandomState(1)
    prompts = [list(rng.randint(1, 32000, prompt_len)) for _ in range(b)]
    counter = {"i": 0}

    def greedy():
        counter["i"] += 1
        return gen.generate_batch(
            prompts, key=jax.random.key(counter["i"]),
            do_sample=False, output_scores=False,
        )["sequences"]

    tps = _timed_rate(greedy, b * max_new, iters=2)
    steps_per_s = tps / b
    cfg = _PROD_CFG
    head_dim = cfg["d_model"] // cfg["num_heads"]
    avg_ctx = prompt_len + max_new / 2
    kv_read = (b * cfg["num_layers"] * 2 * avg_ctx
               * cfg["num_kv_heads"] * head_dim * kv_itemsize)
    if int8:
        # KV8 attention also reads the per-(position, kv-head) f32 dequant
        # scales every step — 1/32 of the int8 cache bytes, real traffic.
        kv_read += (b * cfg["num_layers"] * 2 * avg_ctx
                    * cfg["num_kv_heads"] * 4)
    hbm_gbs = steps_per_s * (weight_bytes + kv_read) / 1e9
    return tps, None, {"hbm_gbs": round(hbm_gbs, 1),
                       "hbm_util": round(hbm_gbs * 1e9 / V5E_HBM_PEAK_BYTES, 4)}


def measure_llm_decode():
    return _decode_leg(int8=False)


def measure_llm_decode_int8():
    return _decode_leg(int8=True)


# Largest-fitting serving model on one 16 GB v5e: Llama-3-8B-class
# geometry (32L, d=4096, GQA 32q/8kv, ffn 11008, vocab 32k) at int8 —
# ~6.6 GB weights + bf16-cache decode head-room. BASELINE.md's north star
# is production-shape serving; this leg proves the chip serves a 7B-class
# model, not just the 1.17B harness model.
_7B_CFG = dict(vocab_size=32000, num_layers=32, num_heads=32,
               num_kv_heads=8, d_model=4096, hidden_dim=11008, max_len=2048)


_7B_CACHE = {}


def _init_7b_int8(model):
    """Random int8 7B params, built directly at int8 on device (cached so
    the decode and serving legs share one tree)."""
    import jax
    import jax.numpy as jnp

    if "params" in _7B_CACHE:
        return _7B_CACHE["params"], _7B_CACHE["weight_bytes"]
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), np.zeros((1, 8), np.int32)
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def fill(key):
        out = []
        for i, leaf in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            if leaf.dtype == jnp.int8:
                out.append(jax.random.randint(k, leaf.shape, -127, 128,
                                              jnp.int8))
            else:
                out.append(
                    (0.01 + 0.005 * jax.random.normal(k, leaf.shape)).astype(
                        jnp.bfloat16
                    )
                )
        return jax.tree_util.tree_unflatten(treedef, out)

    params = fill(jax.random.key(42))
    _7B_CACHE["params"] = params
    _7B_CACHE["weight_bytes"] = sum(
        p.size * p.dtype.itemsize for p in jax.tree_util.tree_leaves(params)
    )
    return params, _7B_CACHE["weight_bytes"]


def measure_llm_7b_int8():
    """Greedy batched decode on the largest-fitting int8 model. The
    quantized param tree is built DIRECTLY at int8 (eval_shape + on-device
    random fill) — materializing a bf16 7B intermediate first (13.5 GB)
    plus its int8 copy would not fit the chip. Random weights carry the
    exact production byte traffic, which is all a bandwidth-bound decode
    measurement needs."""
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.llm import JaxGenerator
    from runia_core_tpu.models import LlamaLM

    model = LlamaLM(**_7B_CFG, dtype=jnp.bfloat16, use_flash=True,
                    quantized=True, quantized_kv=True, fused_qkv=True)
    params, weight_bytes = _init_7b_int8(model)
    p_leaves = jax.tree_util.tree_leaves(params)

    b, prompt_len, max_new = 8, 64, 128
    gen = JaxGenerator(model, params, max_new_tokens=max_new)
    rng = np.random.RandomState(1)
    prompts = [list(rng.randint(1, 32000, prompt_len)) for _ in range(b)]
    counter = {"i": 0}

    def greedy():
        counter["i"] += 1
        return gen.generate_batch(
            prompts, key=jax.random.key(counter["i"]),
            do_sample=False, output_scores=False,
        )["sequences"]

    tps = _timed_rate(greedy, b * max_new, iters=2)
    steps_per_s = tps / b
    head_dim = _7B_CFG["d_model"] // _7B_CFG["num_heads"]
    avg_ctx = prompt_len + max_new / 2
    # int8 KV + its per-(position, kv-head) f32 dequant scales.
    kv_read = (b * _7B_CFG["num_layers"] * 2 * avg_ctx
               * _7B_CFG["num_kv_heads"] * (head_dim * 1 + 4))
    hbm_gbs = steps_per_s * (weight_bytes + kv_read) / 1e9
    return tps, None, {
        "n_params_b": round(sum(int(np.prod(p.shape)) for p in p_leaves
                                if p.dtype == jnp.int8) / 1e9, 2),
        "weight_gb": round(weight_bytes / 1e9, 2),
        "hbm_gbs": round(hbm_gbs, 1),
        "hbm_util": round(hbm_gbs * 1e9 / V5E_HBM_PEAK_BYTES, 4),
    }


def measure_llm_7b_int8_serving():
    """Production-shape SERVING at the 7B-class int8 geometry — the
    BASELINE.md north star (not just bare decode): 24 mixed requests
    (prompts 128-448, budgets 24-56) through the batching engine with
    int8 weights, int8 KV cache, chunked prefill through the KV8-aware
    flash kernel, lane batching, and the open-loop scheduler. Reports
    useful tok/s, occupancy, and the decode phase's HBM accounting."""
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.llm import ContinuousBatchingEngine
    from runia_core_tpu.models import LlamaLM

    model = LlamaLM(**_7B_CFG, dtype=jnp.bfloat16, use_flash=True,
                    quantized=True, quantized_kv=True, fused_qkv=True)
    params, weight_bytes = _init_7b_int8(model)
    rng = np.random.RandomState(11)
    n_req, n_slots = 24, 8
    lengths = rng.randint(128, 449, n_req)
    budgets = rng.randint(24, 57, n_req)
    prompts = [list(rng.randint(1, 32000, int(n))) for n in lengths]
    useful = int(budgets.sum())
    chunk_tokens = int(os.environ.get("RUNIA_7B_CHUNK", 8))
    eng = ContinuousBatchingEngine(
        model, params, num_slots=n_slots, max_ctx=512,
        max_new_tokens=64, chunk_tokens=chunk_tokens, prefill_chunk=128,
        defer_fetch=True, prefill_lanes=4, admission="lpt",
    )

    def one_pass():
        t0 = time.perf_counter()
        for p_, b_ in zip(prompts, budgets):
            eng.submit(p_, int(b_))
        eng.run_until_drained()
        eng.clear_results()
        return useful / (time.perf_counter() - t0)

    one_pass()  # compile warmup
    s0 = dict(eng.stats())
    tps = max(one_pass(), one_pass())
    s1 = eng.stats()
    d_chunks = (s1["decode_chunks"] - s0["decode_chunks"]) // 2
    occupancy = 2 * useful / max(
        1, (s1["decode_chunks"] - s0["decode_chunks"])
        * chunk_tokens * n_slots
    )
    # Decode-phase HBM floor: each decode step reads the full int8
    # weights + the slots' int8 KV; wall includes prefill, so this under-
    # states the decode phase's true utilization (hence "floor").
    cfg = _7B_CFG
    head_dim = cfg["d_model"] // cfg["num_heads"]
    avg_ctx = float(np.mean(lengths) + np.mean(budgets) / 2)
    kv_read = (n_slots * cfg["num_layers"] * 2 * avg_ctx
               * cfg["num_kv_heads"] * head_dim)
    decode_bytes_per_s = tps / useful * d_chunks * chunk_tokens * (
        weight_bytes + kv_read
    )
    return tps, None, {
        "useful_tokens": useful,
        "weight_gb": round(weight_bytes / 1e9, 2),
        "decode_chunks_per_pass": d_chunks,
        "prefill_chunks_per_pass": (s1["prefill_chunks"]
                                    - s0["prefill_chunks"]) // 2,
        "emit_occupancy": round(occupancy, 4),
        "hbm_gbs_floor": round(decode_bytes_per_s / 1e9, 1),
        "hbm_util_floor": round(
            decode_bytes_per_s / V5E_HBM_PEAK_BYTES, 4
        ),
    }


def measure_llm_engine_prefill_ctx2048():
    """Engine-served long-context prefill through the valid-length flash
    kernel (ops/flash_prefill.py): 8 requests with ~1.9k-token prompts at
    max_ctx 2048 drain through a use_flash engine with 512-token chunked
    prefill and the open-loop scheduler. The metric is PROMPT tok/s — the
    engine-side counterpart of the bare ``llama1b_prefill_8x1024`` leg
    (VERDICT r4 item 1: engine prefill within 20% of the bare rate). The
    kernel's key-block clamp makes chunk cost scale with the written
    prefix, so the whole drain does the true P^2/2 attention work."""
    import jax.numpy as jnp

    from runia_core_tpu.llm import ContinuousBatchingEngine
    from runia_core_tpu.models import LlamaLM

    st = _get_prod_llama()
    model = LlamaLM(**_PROD_CFG, dtype=jnp.bfloat16, use_flash=True)
    rng = np.random.RandomState(9)
    n_req, budget = 8, 4
    C = int(os.environ.get("RUNIA_PREFILL_CHUNK", 512))
    lengths = rng.randint(1700, 2048 - budget, n_req)
    prompts = [list(rng.randint(1, 32000, int(n))) for n in lengths]
    prompt_tokens = int(lengths.sum())
    lanes = int(os.environ.get("RUNIA_PREFILL_LANES", 4))
    eng = ContinuousBatchingEngine(
        model, st["params"], num_slots=max(4, lanes), max_ctx=2048,
        max_new_tokens=budget, chunk_tokens=budget, prefill_chunk=C,
        defer_fetch=True, prefill_lanes=lanes,
    )

    def drain():
        t0 = time.perf_counter()
        eng.generate_all(prompts)
        eng.clear_results()
        return prompt_tokens / (time.perf_counter() - t0)

    drain()  # compile warmup (prefill-chunk + decode-chunk programs)
    tps = max(drain(), drain())

    # Isolated chunk-PROGRAM rate (the flash-prefill device program the
    # drain launches): marginal-window timing cancels per-launch host
    # overhead, so this is the kernel-level number to compare against the
    # bare llama1b_prefill leg; the drain rate above additionally pays
    # ~10-15 ms of tunnel dispatch/upload per launch on this 1-core host.
    from runia_core_tpu.utils.profiling import benchmark as _mbench

    W = min(4, eng.num_slots)
    fn = eng._prefill_chunk_many_prog(W)
    toks_c = jnp.asarray(rng.randint(1, 32000, (W, C)), jnp.int32)
    state = {"cache": eng.cache, "sl": eng.step_logits,
             "ss": eng._slot_state(), "hp": eng._hid_prev}

    def one_chunk():
        (state["cache"], _, state["sl"], state["ss"],
         state["hp"]) = fn(
            eng.params, None, state["cache"], None, state["sl"],
            state["ss"], jnp.arange(W, dtype=jnp.int32), toks_c,
            jnp.zeros((W,), jnp.int32), jnp.full((W,), C - 1, jnp.int32),
            jnp.ones((W,), jnp.int32), jnp.full((W,), 2048, jnp.int32),
            jnp.zeros((W,), jnp.int32), state["hp"],
            jnp.full((W,), C, jnp.int32),
        )
        return state["sl"]

    one_chunk()
    _, sec = _mbench(one_chunk, iters=8, warmup=2, windows=3)
    chunk_tps = W * C / sec
    # Analytic prefill FLOPs: 2*N_params per token + causal attention over
    # each prompt's true length (the kernel skips past-the-window blocks).
    cfg = _PROD_CFG
    attn = sum(
        2 * 2 * cfg["num_layers"] * (int(n) ** 2) * cfg["d_model"] / 2
        for n in lengths
    )
    flops = 2 * st["n_params"] * prompt_tokens + attn
    achieved = tps / prompt_tokens * flops
    return tps, achieved / 1e12, {
        "mfu": round(achieved / V5E_BF16_PEAK_FLOPS, 4),
        "prefill_chunk": C,
        "n_requests": n_req,
        "prompt_tokens": prompt_tokens,
        "chunk_program_tok_s": round(chunk_tps, 1),
        "chunk_program_mfu": round(
            chunk_tps * 2 * st["n_params"] / V5E_BF16_PEAK_FLOPS, 4
        ),
    }


def measure_llm_continuous():
    """Continuous in-flight batching vs static batched decode on a mixed
    serving workload: 96 requests, prompt lengths 16-192, per-request
    budgets 8-64, against a 32-wide device batch. Static batching must run
    ceil(96/32)=3 sequential batches, each padding every prompt to the
    longest and decoding the LONGEST budget for the whole batch; the
    engine keeps 32 slots hot and refills a slot the moment its request
    finishes. The metric is USEFUL tok/s — requested tokens / wall —
    which is what a serving deployment sells. (Decode at this size is
    weight-bound, so tok/s scales with average busy slots: the engine's
    win IS its occupancy advantage.)"""
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.llm import ContinuousBatchingEngine, JaxGenerator
    from runia_core_tpu.models import LlamaLM

    st = _get_prod_llama()
    # Prompts are 16-192 tokens: the engine's batched bucketed prefill is
    # the right path (flash engages on >=128-token chunked prefills — see
    # the ctx-2048 leg), so the engine model runs dense attention.
    model = LlamaLM(**_PROD_CFG, dtype=jnp.bfloat16)
    rng = np.random.RandomState(5)
    n_req, n_slots = 96, 32
    lengths = rng.randint(16, 193, n_req)
    budgets = rng.randint(8, 65, n_req)
    prompts = [list(rng.randint(1, 32000, int(n))) for n in lengths]
    useful = int(budgets.sum())

    # chunk_tokens trades refill granularity (occupancy) against per-chunk
    # launch cost. The open-loop drain (defer_fetch) has no fetch RTT on
    # the critical path, so smaller chunks pay only dispatch overhead.
    # Env knob for re-scanning.
    chunk_tokens = int(os.environ.get("RUNIA_CHUNK_TOKENS", 8))
    eng = ContinuousBatchingEngine(
        model, st["params"], num_slots=n_slots, max_ctx=320,
        max_new_tokens=64, chunk_tokens=chunk_tokens, prompt_bucket=64,
        # Offline drain: longest-budget-first admission packs the tail
        # (decode chunks cost a full weight read regardless of how many
        # slots emit, so fewer chunks == more tok/s), and the open-loop
        # drain dispatches every chunk without a single mid-drain fetch
        # (budget-bound workload: the emission schedule is deterministic).
        admission=os.environ.get("RUNIA_ADMISSION", "lpt"),
        defer_fetch=os.environ.get("RUNIA_DEFER_FETCH", "1") == "1",
    )

    def engine_pass():
        for p_, b_ in zip(prompts, budgets):
            eng.submit(p_, int(b_))
        eng.run_until_drained()

    def best_of(fn, n=3):
        # Tunnel round-trip latency varies minute-to-minute; the best of n
        # timed passes reports the engine, not the network's worst mood.
        best = 0.0
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = max(best, useful / (time.perf_counter() - t0))
        return best

    engine_pass()  # compile warmup (prefill shapes + chunk program)
    s0 = dict(eng.stats())
    engine_tps = best_of(engine_pass)
    s1 = eng.stats()

    gen = JaxGenerator(model, st["params"], max_new_tokens=64)
    kwargs = dict(do_sample=False, output_scores=False, pad_to=192)

    def static_pass():
        # One full device batch at a time — the strongest static baseline
        # at the same batch width the engine uses.
        for i in range(0, n_req, n_slots):
            _sync(gen.generate_batch(
                prompts[i:i + n_slots], key=jax.random.key(0), **kwargs
            )["sequences"])

    static_pass()  # compile warmup
    static_tps = best_of(static_pass)

    # Fused offline drain: the same workload as ONE device program (the
    # scheduler runs on-device — zero per-chunk host round trips). At toy
    # scale it wins 3.9x over the tunnel; at this production size the
    # lookahead-pipelined interactive drain is already device-bound, so
    # the leg reports whichever drain is faster and records both.
    feng = ContinuousBatchingEngine(
        model, st["params"], num_slots=n_slots, max_ctx=320,
        max_new_tokens=64, prompt_bucket=64, prefill_chunk=64,
        chunk_tokens=int(os.environ.get("RUNIA_FUSED_CHUNK", 4)),
        admission="lpt",  # device queue in longest-budget-first order
    )
    budget_list = [int(b_) for b_ in budgets]
    lanes = int(os.environ.get("RUNIA_FUSED_LANES", 8))
    feng.generate_all_fused(prompts, budget_list, prefill_lanes=lanes)
    fused_tps = best_of(lambda: feng.generate_all_fused(
        prompts, budget_list, prefill_lanes=lanes
    ))

    return max(fused_tps, engine_tps), None, {
        "useful_tokens": useful,
        "speedup_vs_static_batch": round(
            max(fused_tps, engine_tps) / static_tps, 4
        ),
        "fused_tok_s": round(fused_tps, 2),
        **feng._last_fused_stats,
        "interactive_tok_s": round(engine_tps, 2),
        "interactive_vs_static": round(engine_tps / static_tps, 4),
        "fetch_s": round((s1["t_fetch_s"] - s0["t_fetch_s"]) / 3, 2),
        "prefill_s": round((s1["t_prefill_s"] - s0["t_prefill_s"]) / 3, 2),
        # Occupancy diagnostics: decode chunks per timed pass (each costs a
        # full weight read) and useful tokens per decoded slot-step.
        # Divisors match best_of's 3 timed engine passes.
        "decode_chunks_per_pass": (s1["decode_chunks"]
                                   - s0["decode_chunks"]) // 3,
        "emit_occupancy": round(
            3 * useful / max(1, (s1["decode_chunks"] - s0["decode_chunks"])
                             * chunk_tokens * n_slots), 4),
    }


def _self_draft():
    """Int8-quantized SELF-draft of the production target (same depth,
    quantized weights) — quantized self-speculation. Unlike a
    layer-truncation of a random-init target (whose proposals are
    ~uncorrelated, acceptance ~1/vocab), the quantized twin agrees with the
    target's argmax wherever the top-1 logit gap exceeds the quantization
    noise, so the measured acceptance rate is a real production signal and
    each draft step reads half the weight bytes of a target step."""
    import jax.numpy as jnp

    from runia_core_tpu.models import LlamaLM, quantize_llama_params

    st = _get_prod_llama()
    if "draft_params" not in st:
        st["draft_params"] = quantize_llama_params(st["params"],
                                                   on_device=True)
    draft = LlamaLM(**_PROD_CFG, dtype=jnp.bfloat16, quantized=True)
    return draft, st["draft_params"]


def measure_llm_speculative_production():
    """Speculative decode on the production target with an int8 quantized
    self-draft (see _self_draft): acceptance is a real signal and the
    draft's decode step is ~2x cheaper on the HBM-bound path."""
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.llm import JaxGenerator
    from runia_core_tpu.llm.speculative import SpeculativeGenerator
    from runia_core_tpu.models import LlamaLM

    st = _get_prod_llama()
    max_new = 32
    target = LlamaLM(**_PROD_CFG, dtype=jnp.bfloat16)
    draft, draft_params = _self_draft()
    spec = SpeculativeGenerator(target, st["params"], draft, draft_params,
                                gamma=4, max_new_tokens=max_new)
    plain = JaxGenerator(target, st["params"], max_new_tokens=max_new)
    prompt = list(np.random.RandomState(2).randint(1, 32000, 32))
    counter = {"i": 0}
    acceptance = {"rate": None}

    def speculative():
        counter["i"] += 1
        out = spec.generate(prompt, key=jax.random.key(counter["i"]))
        acceptance["rate"] = out["acceptance_rate"]
        return out["sequences"]

    def greedy():
        counter["i"] += 1
        return plain.generate(
            prompt, do_sample=False,
            output_attentions=False, output_hidden_states=False,
        )["sequences"]

    spec_tps = _timed_rate(speculative, max_new, 3)
    greedy_tps = _timed_rate(greedy, max_new, 3)
    return spec_tps, None, {
        "speedup_vs_greedy": round(spec_tps / greedy_tps, 4),
        "acceptance_rate": round(float(acceptance["rate"]), 4),
    }


def _distilled_draft_pair(eps=0.03, draft_layers=4):
    """Target + cheap shared-weight draft with distillation-grade agreement.

    Round 3 shipped the engine with a full-depth int8 self-draft: real
    acceptance (0.87) but a ~0.55 cost ratio — and the bandwidth model says
    a draft that expensive can NEVER break even (speculative_breakeven
    returns 1.0), which is exactly what the bench measured (0.87x plain).
    A production deployment drafts with a distilled small model (~0.1-0.2x
    cost, 0.7-0.9 acceptance) — unbuildable from random-init weights in a
    bench. This constructs the cost/agreement geometry honestly instead:
    the target is the production-size model with its upper blocks' output
    projections scaled by ``eps`` (every weight byte still read per step —
    identical HBM cost to the pristine target; the function is near- but
    not exactly-identity above layer ``draft_layers``), and the draft is
    the FIRST ``draft_layers`` blocks + final norm + lm_head sharing the
    target's buffers (zero extra HBM). Measured on a 22-layer CPU probe,
    eps=0.03 gives ~0.89 argmax agreement — the distilled-draft band.
    Acceptance is still measured live by the engine's exact counters.
    """
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.models import LlamaLM

    st = _get_prod_llama()
    L = _PROD_CFG["num_layers"]

    @jax.jit
    def surgery(p):
        out = {"params": dict(p["params"])}
        for i in range(draft_layers, L):
            blk = dict(out["params"][f"block_{i}"])
            for nm in ("o", "down"):
                sub = dict(blk[nm])
                sub["kernel"] = sub["kernel"] * jnp.asarray(
                    eps, sub["kernel"].dtype
                )
                blk[nm] = sub
            out["params"][f"block_{i}"] = blk
        return out

    t_params = surgery(st["params"])
    d_params = {"params": {
        k: v for k, v in t_params["params"].items()
        if k in ("embed", "norm_f", "lm_head")
        or (k.startswith("block_") and int(k.split("_")[1]) < draft_layers)
    }}
    target = LlamaLM(**_PROD_CFG, dtype=jnp.bfloat16)
    draft = LlamaLM(**dict(_PROD_CFG, num_layers=draft_layers),
                    dtype=jnp.bfloat16)

    def read_bytes(params):
        # Per-decode-step HBM read: all projection weights + lm_head
        # (embed rows are a token gather, not a full-table read).
        return sum(
            p.size * p.dtype.itemsize
            for path, p in jax.tree_util.tree_leaves_with_path(params)
            if "embed" not in jax.tree_util.keystr(path)
        )

    cost_ratio = read_bytes(d_params) / read_bytes(t_params)
    return target, t_params, draft, d_params, cost_ratio


def measure_llm_spec_engine():
    """Speculative continuous batching with a distillation-grade draft
    (see _distilled_draft_pair: 4-of-22 shared-weight layers, ~0.2 cost
    ratio), chunked prefill, and prefix caching on a shared-system-prompt
    workload (the agent-serving shape: 24 requests, one 256-token system
    prefix + per-request suffixes, budgets 16-48). The engine runs with
    its measured break-even guard armed (spec_min_acceptance from
    speculative_breakeven) — the round-3 regression mode (a draft too
    expensive to ever pay) now auto-falls-back instead of shipping a
    slowdown. Reports useful tok/s, speedup vs the plain engine on the
    SAME target, live acceptance, and the break-even floor."""
    import jax.numpy as jnp

    from runia_core_tpu.llm import ContinuousBatchingEngine
    from runia_core_tpu.llm.continuous import speculative_breakeven
    from runia_core_tpu.models import LlamaLM

    target, t_params, draft, d_params, cost_ratio = _distilled_draft_pair()

    rng = np.random.RandomState(7)
    system = list(rng.randint(1, 32000, 256))
    n_req = 24
    budgets = rng.randint(16, 49, n_req)
    prompts = [system + list(rng.randint(1, 32000, int(n)))
               for n in rng.randint(8, 65, n_req)]
    useful = int(budgets.sum())
    kw = dict(num_slots=8, max_ctx=448, max_new_tokens=48, chunk_tokens=15,
              prefill_chunk=64, prefix_cache=True)

    def timed_pass(eng):
        t0 = time.perf_counter()
        for pr, b in zip(prompts, budgets):
            eng.submit(pr, int(b))
        eng.run_until_drained()
        return useful / (time.perf_counter() - t0)

    # Jitted engine programs cache per instance: warm and time on the SAME
    # engine (a drained engine is reusable — slots free, queue empty).
    # At cost_ratio ~0.2 the bandwidth model peaks around gamma=4: a round
    # costs 5 draft reads (~0.45 GB each) + one full verify read (2.21 GB)
    # and emits E(a) = (1-a^5)/(1-a) tokens.
    gamma = int(os.environ.get("RUNIA_SPEC_GAMMA", 4))
    breakeven = speculative_breakeven(cost_ratio, gamma)
    spec_eng = ContinuousBatchingEngine(
        target, t_params, **kw, draft_model=draft,
        draft_params=d_params, gamma=gamma,
        spec_min_acceptance=breakeven,
    )
    timed_pass(spec_eng)  # compile warmup
    hits0 = spec_eng.prefix_hits
    # Best of 2: tunnel latency noise, see measure_llm_continuous.
    spec_tps = max(timed_pass(spec_eng), timed_pass(spec_eng))
    plain_eng = ContinuousBatchingEngine(target, t_params, **kw)
    timed_pass(plain_eng)  # compile warmup
    plain_tps = max(timed_pass(plain_eng), timed_pass(plain_eng))
    stats = spec_eng.stats()
    return spec_tps, None, {
        "useful_tokens": useful,
        "speedup_vs_plain_engine": round(spec_tps / plain_tps, 4),
        # The target is surgically modified for distillation-grade
        # draft/target agreement (see _distilled_draft_pair); its token
        # streams are NOT a real production model's. tok/s and speedup are
        # real (identical HBM traffic); acceptance is real for THIS pair.
        "synthetic_target": True,
        "prefix_hits": int(spec_eng.prefix_hits - hits0),
        # Cumulative over warmup+timed passes (a rate, so that's fine):
        # the engine's exact draft-acceptance counters from stats().
        "acceptance_rate": stats.get("acceptance"),
        "draft_cost_ratio": round(cost_ratio, 4),
        "breakeven_acceptance": round(breakeven, 4),
        "spec_auto_disabled": bool(stats.get("spec_disabled", 0)),
    }


class _PairTok:
    """Synthetic HF-style pair tokenizer for the NLI bench legs.

    The serving texts are token-id lists (tokenizer=None server); this
    shim packs each (premise, hypothesis) pair as
    ``[CLS] p... [SEP] h... [SEP]`` with ids folded into the NLI vocab —
    byte- and shape-accurate input for a random-weight entailment model
    (the compute is what the leg measures; no downloads)."""

    def __init__(self, vocab: int):
        self.vocab = vocab

    def __call__(self, premises, hypotheses, padding=True, truncation=True,
                 max_length=128, return_tensors="np"):
        half = (max_length - 3) // 2
        rows = []
        for p, h in zip(premises, hypotheses):
            fold = lambda seq: [1 + int(t) % (self.vocab - 2) for t in seq]
            rows.append([1] + fold(p)[:half] + [2] + fold(h)[:half] + [2])
        t = max(len(r) for r in rows)
        ids = np.zeros((len(rows), t), np.int64)
        mask = np.zeros((len(rows), t), np.int64)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": ids, "attention_mask": mask}


# microsoft/deberta-v2-xxlarge-mnli geometry (the reference's strongest
# documented entailment model) and the large-mnli geometry used in-loop by
# the serving leg. Random weights — byte-accurate compute, no downloads.
_NLI_XXLARGE = dict(vocab_size=128100, num_labels=3, num_layers=48,
                    num_heads=24, d_model=1536, intermediate_size=6144,
                    max_position_embeddings=512, position_buckets=256,
                    conv_kernel_size=3)
_NLI_LARGE = dict(vocab_size=128100, num_labels=3, num_layers=24,
                  num_heads=16, d_model=1024, intermediate_size=4096,
                  max_position_embeddings=512, position_buckets=256,
                  conv_kernel_size=3)


def _init_nli(cfg):
    """(model, bf16 params, n_params) for a random-weight DeBERTa NLI."""
    import jax
    import jax.numpy as jnp

    from runia_core_tpu.models import DebertaV2Classifier

    model = DebertaV2Classifier(**cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.key(5), np.zeros((1, 16), np.int32),
        np.ones((1, 16), np.int32),
    )
    params = jax.jit(
        lambda p: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p
        )
    )(params)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(params))
    return model, params, n


def measure_deberta_nli():
    """TPU entailment throughput at the deberta-v2-xxlarge-mnli geometry
    (1.5B params): (16, 128) premise/hypothesis pairs through
    ``wrap_jax_nli`` — the device path ``llm.scores.semantic_entropy``
    dispatches to (reference scores.py:429-436 runs its NLI on the compute
    device; this is its TPU number)."""
    from runia_core_tpu.models import wrap_jax_nli

    model, params, n_params = _init_nli(_NLI_XXLARGE)
    tok = _PairTok(_NLI_XXLARGE["vocab_size"])
    nli = wrap_jax_nli(model, params, tok, max_len=128,
                       len_buckets=(128,), batch_bucket=16)
    rng = np.random.RandomState(3)
    b, t = 16, 128
    prem = [list(rng.randint(1, 32000, 40)) for _ in range(b)]
    hyp = [list(rng.randint(1, 32000, 40)) for _ in range(b)]

    counter = {"i": 0}

    def call():
        counter["i"] += 1
        return nli(prem, hyp)

    pps = _timed_rate(call, b, iters=8)
    # Analytic: 2*N FLOPs per token (disentangled attention's extra c2p/
    # p2c dots are captured in XLA cost where available; this floor is the
    # dense-matmul account).
    flops_per_pair = 2 * n_params * t
    achieved = pps * flops_per_pair
    return pps, achieved / 1e12, {
        "mfu": round(achieved / V5E_BF16_PEAK_FLOPS, 4),
        "n_params_b": round(n_params / 1e9, 2),
        "pair_tokens": t,
    }


def measure_llm_uncertainty_serving():
    """The product metric at production size: uncertainty-scored responses
    per second, ALL SIX methods. ``UncertaintyServer`` over the 1.17B
    engine in merged mode — each prompt's greedy pass (in-loop RAUQ) and
    its 4 sampled duplicates drain together (per-request decoding modes,
    prefix-cached prefill, open-loop scheduling) with in-loop hidden-state
    streaming for eigen_score — plus on-TPU DeBERTa-large-geometry NLI for
    semantic entropy. This is the flow the reference serves one blocking
    HF-generate call at a time (reference llm_uncertainty/scores.py:
    347-524)."""
    import jax.numpy as jnp

    from runia_core_tpu.llm import UncertaintyServer
    from runia_core_tpu.models import LlamaLM, wrap_jax_nli

    st = _get_prod_llama()
    model = LlamaLM(**_PROD_CFG, dtype=jnp.bfloat16)  # engine: no flash
    n_prompts, n_samples, max_new = 16, 4, 32
    requests = [
        {"method_name": "perplexity"},
        {"method_name": "generation_entropy"},
        {"method_name": "RAUQ", "token_aggregation": "original",
         "head_aggregation": "original"},
        {"method_name": "normalized_entropy"},
        {"method_name": "eigen_score", "layer_index": 15},
        {"method_name": "semantic_entropy"},
    ]
    nli_model, nli_params, _ = _init_nli(_NLI_LARGE)
    nli = wrap_jax_nli(
        nli_model, nli_params, _PairTok(_NLI_LARGE["vocab_size"]),
        max_len=96, len_buckets=(96,), batch_bucket=16,
    )
    # Short prompts (24-64 tokens): the classic BUCKETED prefill admits
    # whole admission waves in one batched (F, 64) program — better than
    # chunked trickle at these lengths; the merged drain's det/sample
    # duplicates don't need the prefix cache to amortize a 3 ms prefill.
    server = UncertaintyServer(
        model, st["params"], None, requests,
        num_samples=n_samples, max_new_tokens=max_new, temperature=0.9,
        entailment_model=nli, entailment_tokenizer=None,
        engine_kwargs=dict(num_slots=int(os.environ.get(
                               "RUNIA_UNC_SLOTS", 24)),
                           max_ctx=128,
                           chunk_tokens=int(os.environ.get(
                               "RUNIA_UNC_CHUNK", 16)),
                           prefill_chunk=None, prompt_bucket=64),
    )
    assert server._merged  # one drain serves the det pass and the samples

    def prompt_batch(seed):
        # A fresh prompt set per pass: identical prompts would hit the
        # server's persistent prefix cache and skip the timed passes'
        # prefill work — measure fresh-traffic throughput instead.
        rng = np.random.RandomState(seed)
        return [list(rng.randint(1, 32000, int(n)))
                for n in rng.randint(24, 65, n_prompts)]

    def one_pass(seed):
        t0 = time.perf_counter()
        texts, scores = server.serve(prompt_batch(seed))
        dt = time.perf_counter() - t0
        assert len(scores) == n_prompts
        for s in scores:
            assert np.isfinite(s["perplexity"])
            assert np.isfinite(s["RAUQ_original_original"])
            assert np.isfinite(s["eigen_score"])
            assert np.isfinite(s["semantic_entropy"])
        return dt

    one_pass(11)  # compile warmup (engine programs + NLI shape)
    # Best of 2 (tunnel latency noise, see measure_llm_continuous).
    dt = min(one_pass(12), one_pass(13))
    return n_prompts / dt, None, {
        "n_prompts": n_prompts, "num_samples": n_samples,
        "max_new_tokens": max_new, "methods": len(requests),
        "nli": "deberta-large-geometry on-TPU",
        "decoded_tokens_per_response": max_new * (1 + n_samples),
    }


def run_suite():
    """Run every leg fault-isolated: one failing leg reports an error entry
    instead of killing the whole benchmark (the headline leg runs first and
    is the only one main() requires)."""
    suite = []

    # Iteration aid over the tunneled TPU: RUNIA_BENCH_LEGS="prefix,prefix"
    # runs only matching legs (substring match); unset runs everything.
    only = [s for s in os.environ.get("RUNIA_BENCH_LEGS", "").split(",") if s]
    # Global wall budget: once exceeded, remaining legs are SKIPPED with a
    # marker instead of risking an external timeout killing the process
    # before the one JSON line prints (the driver contract).
    budget_s = float(os.environ.get("RUNIA_BENCH_BUDGET_S", 3000))
    t_start = time.perf_counter()

    def leg(metric, unit, fn, extra_key=None):
        """Run one benchmark; fn returns (value, tflops, third). ``third``
        is reported under "mfu" (default), under ``extra_key``, or — when it
        is a dict — merged into the entry verbatim (e.g. the decode legs'
        {"hbm_gbs", "hbm_util"})."""
        if only and not any(s in metric for s in only):
            return None
        if time.perf_counter() - t_start > budget_s:
            print(f"bench: skipping {metric} (over {budget_s:.0f}s budget)",
                  file=sys.stderr, flush=True)
            suite.append({"metric": metric, "value": None, "unit": unit,
                          "skipped": f"over {budget_s:.0f}s time budget"})
            return None
        print(f"bench: running {metric} ...", file=sys.stderr, flush=True)
        try:
            value, tflops, third = fn()
            entry = {
                "metric": metric, "value": round(value, 2), "unit": unit,
                "tflops": round(tflops, 2) if tflops else None,
            }
            if isinstance(third, dict):
                entry.update(third)
            else:
                entry[extra_key or "mfu"] = round(third, 4) if third else None
            suite.append(entry)
            return value
        except Exception as exc:
            print(f"bench: {metric} failed: {exc}", file=sys.stderr, flush=True)
            suite.append({"metric": metric, "value": None, "unit": unit,
                          "error": str(exc)[:200]})
            return None

    ips18 = leg(
        "larex_resnet18_32px", "img/s",
        # ResNet-18 CIFAR-stem @32px forward ~0.56 GF/img x2 (fwd + 16 MC
        # passes over the scoring stack amortized) — analytic fallback only.
        lambda: measure_larex(IMG, BATCH, resnet50=False, iters=200,
                              analytic_flops_per_img=1.1e9),
    )
    leg(
        "larex_resnet18_32px_int8", "img/s",
        # Same pipeline with the PTQ int8 backbone (int8xint8->int32 convs
        # on the MXU, models/quant_vision.py); scoring stack stays f32.
        # MFU is reported against the bf16 peak, so >64% reflects the int8
        # MXU rate, not extra FLOPs. Score corr vs bf16 path 0.993,
        # AUROC delta 0.015 on the random-weight worst case (2026-08-17).
        lambda: measure_larex(IMG, BATCH, resnet50=False, iters=200,
                              analytic_flops_per_img=1.1e9, int8=True),
    )
    leg(
        "larex_resnet50_224px", "img/s",
        # ResNet-50 @224 forward ~4.1 GF/img + MC/entropy stack.
        # Batch 128 is this leg's sweet spot (45% MFU vs 39% at 64,
        # 42% at 256 — measured 2026-08-17).
        lambda: measure_larex(224, 128, resnet50=True, iters=20,
                              analytic_flops_per_img=4.5e9),
    )
    leg("object_scorer_256px_20det", "det/s", measure_objects)
    # Production-size LLM serving legs (~1.17B-param Llama, VERDICT r2
    # item 1). Prefill is compute-bound (MFU vs the FLOP peak); decode is
    # HBM-bound (achieved GB/s vs the 819 GB/s v5e peak); speculative uses
    # a layer-truncated correlated draft and reports measured acceptance.
    leg("llama1b_prefill_8x1024", "tok/s", measure_llm_prefill)
    leg("llama1b_engine_prefill_ctx2048", "tok/s",
        measure_llm_engine_prefill_ctx2048)
    leg("llama1b_decode_greedy_16x256", "tok/s", measure_llm_decode)
    leg("llama1b_decode_int8kv8_16x256", "tok/s", measure_llm_decode_int8)
    leg("llama1b_serving_96req", "tok/s", measure_llm_continuous)
    leg("llama1b_speculative_1x32", "tok/s", measure_llm_speculative_production)
    leg("llama1b_spec_engine_24req_prefix", "tok/s", measure_llm_spec_engine)
    leg("llama1b_uncertainty_serving_16x5", "responses/s",
        measure_llm_uncertainty_serving)
    # 7B-class legs hold ~6 GB of params — they run late and release the
    # cache afterwards so the (3 GB + init transients) NLI leg fits; an
    # earlier ordering OOMed the deberta leg and slowed the serving legs
    # under allocator pressure.
    leg("llama7b_int8_decode_8x128", "tok/s", measure_llm_7b_int8)
    leg("llama7b_int8_serving_24req", "tok/s", measure_llm_7b_int8_serving)
    _7B_CACHE.clear()
    leg("deberta_xxl_nli_16x128", "pairs/s", measure_deberta_nli)
    return ips18, suite


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
    """Steady-state per-image latency of the reference fast-LaRex flow on CPU."""
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
    try:
        tpu_ips, suite = run_suite()
    except Exception as exc:  # backend init / OOM before any leg ran
        print(f"bench: suite aborted: {exc}", file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": "ood_scored_images_per_sec_per_chip", "value": None,
            "unit": "img/s", "vs_baseline": None, "error": str(exc)[:300],
        }))
        return
    if os.environ.get("RUNIA_MEASURE_BASELINE"):
        try:
            cpu_ips = measure_cpu_reference()
        except Exception as exc:  # pragma: no cover
            print(f"baseline measurement failed: {exc}", file=sys.stderr)
            cpu_ips = PINNED_CPU_BASELINE_IPS
    else:
        cpu_ips = PINNED_CPU_BASELINE_IPS
    vs = (tpu_ips / cpu_ips) if (cpu_ips and tpu_ips) else None
    print(
        json.dumps(
            {
                "metric": "ood_scored_images_per_sec_per_chip",
                "value": round(tpu_ips, 2) if tpu_ips else None,
                "unit": (
                    "img/s (LaREx: ResNet-18 "
                    + ("bf16" if "bf" in DTYPE else "f32")
                    + " + 16xMC-DropBlock + entropy-512 + PCA-256 + LaREM, f32 scoring)"
                ),
                "vs_baseline": round(vs, 2) if vs else None,
                "suite": suite,
            }
        )
    )


if __name__ == "__main__":
    main()
