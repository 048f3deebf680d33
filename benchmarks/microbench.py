"""Reproducible micro-benchmarks for the hot kernels.

Each subcommand prints one line with a steady-state rate on the current
backend (run on the TPU for the numbers in docs/PERFORMANCE.md):

    python benchmarks/microbench.py entropy   # Pallas KL-entropy kernel
    python benchmarks/microbench.py nms       # fixed-point greedy NMS
    python benchmarks/microbench.py ring      # sequence-parallel attention
    python benchmarks/microbench.py moe       # expert-parallel MoE FFN
    python benchmarks/microbench.py decode    # batched KV-cached LLM decode
    python benchmarks/microbench.py resize    # native host bilinear resize
    python benchmarks/microbench.py all
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _rate(fn, *args, iters=20, warmup=2):
    """Pipelined steady-state seconds per call via the library's
    marginal-window benchmark — block_until_ready returns at ENQUEUE on
    tunneled devices, so a block-timed loop here would measure dispatch."""
    from runia_core_tpu.utils.profiling import benchmark

    _, sec = benchmark(fn, *args, iters=iters, warmup=warmup)
    return sec


def bench_entropy():
    from runia_core_tpu.ops.entropy import marginal_entropy

    rng = np.random.RandomState(0)
    clouds = jnp.asarray(rng.randn(512, 16, 512).astype(np.float32))
    f = jax.jit(lambda c: marginal_entropy(c, 5))
    dt = _rate(f, clouds)
    print(f"entropy: 512 clouds x 16 samples x 512 dims in {dt*1e3:.2f} ms "
          f"({512/dt:,.0f} clouds/s)")


def bench_nms():
    from runia_core_tpu.ops.nms import nms_mask

    rng = np.random.RandomState(0)
    n = 4096
    boxes = jnp.asarray(rng.rand(n, 4).astype(np.float32) * 100)
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 5 + boxes[:, 2:] % 20)
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    dt = _rate(lambda: nms_mask(boxes, scores, 0.5))
    print(f"nms: {n} boxes in {dt*1e3:.2f} ms")


def bench_ring():
    from runia_core_tpu.parallel import make_mesh, ring_attention

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, axis_names=("seq", "unused"))
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(4, 8, n_dev * 512, 64).astype(np.float32))
               for _ in range(3))
    f = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh, "seq"))
    dt = _rate(f, q, k, v, iters=5)
    tokens = 4 * n_dev * 512
    print(f"ring attention: {q.shape} causal over {n_dev} device(s) in "
          f"{dt*1e3:.1f} ms ({tokens/dt:,.0f} tok/s)")


def bench_moe():
    from runia_core_tpu.parallel import init_moe, make_mesh, sharded_moe_ffn

    n_dev = len(jax.devices())
    ep = max(d for d in (1, 2, 4, 8) if n_dev % d == 0)
    mesh = make_mesh(n_dev, model_parallel=ep)
    params = init_moe(jax.random.key(0), 512, 2048, num_experts=2 * ep)
    tokens = jax.random.normal(jax.random.key(1), (8192, 512))
    f = jax.jit(lambda p, x: sharded_moe_ffn(p, x, mesh, top_k=2))
    dt = _rate(f, params, tokens, iters=10)
    print(f"moe: 8192 tokens, {2*ep} experts over {ep} device(s), top-2: "
          f"{dt*1e3:.2f} ms ({8192/dt:,.0f} tok/s)")


def bench_decode():
    from runia_core_tpu.llm import JaxGenerator
    from runia_core_tpu.models.transformer import CausalLM

    model = CausalLM(vocab_size=32000, num_layers=8, num_heads=8,
                     d_model=512, max_len=256)
    params = model.init(jax.random.key(0), np.zeros((1, 8), np.int32))
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, 32000, rng.randint(4, 17)))
               for _ in range(32)]
    gen = JaxGenerator(model, params, max_new_tokens=64)
    kwargs = dict(do_sample=True, output_scores=False)
    gen.generate_batch(prompts, key=jax.random.key(1), **kwargs)
    t0 = time.perf_counter()
    for i in range(5):
        gen.generate_batch(prompts, key=jax.random.key(2 + i), **kwargs)
    dt = (time.perf_counter() - t0) / 5
    print(f"decode: 32 prompts x 64 tokens (8L x 512d, 32k vocab) in "
          f"{dt:.2f} s ({32*64/dt:,.0f} tok/s)")


def bench_llama():
    import jax.numpy as jnp

    from runia_core_tpu.llm import JaxGenerator
    from runia_core_tpu.models import LlamaLM

    model = LlamaLM(vocab_size=32000, num_layers=8, num_heads=8,
                    num_kv_heads=4, d_model=512, hidden_dim=1408,
                    max_len=256, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), np.zeros((1, 8), np.int32))
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, 32000, rng.randint(4, 17)))
               for _ in range(32)]
    gen = JaxGenerator(model, params, max_new_tokens=64)
    kwargs = dict(do_sample=True, output_scores=False)
    gen.generate_batch(prompts, key=jax.random.key(1), **kwargs)
    t0 = time.perf_counter()
    for i in range(5):
        gen.generate_batch(prompts, key=jax.random.key(2 + i), **kwargs)
    dt = (time.perf_counter() - t0) / 5
    print(f"llama decode: 32 prompts x 64 tokens (8L x 512d GQA bf16) in "
          f"{dt:.2f} s ({32*64/dt:,.0f} tok/s)")


def bench_objects():
    from runia_core_tpu.detectors import MDLatentSpace
    from runia_core_tpu.extraction import build_object_scorer, pad_detections
    from runia_core_tpu.models import ResNet18, build_tapped_forward

    b, img, max_det = 64, 256, 20
    rng = np.random.RandomState(0)
    model = ResNet18(num_classes=10, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((b, img, img, 3)))
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
    dt = _rate(lambda: scorer(images, padded), iters=50)
    print(f"objects: {b} imgs x {max_det} dets (256px, ResNet-18 bf16) in "
          f"{dt*1e3:.2f} ms ({b*max_det/dt:,.0f} det/s)")


def bench_resize():
    from runia_core_tpu.data import HAVE_NATIVE, gather_resize_normalize

    rng = np.random.RandomState(0)
    images = (rng.rand(1024, 256, 256, 3) * 255).astype(np.uint8)
    idx = np.arange(256, dtype=np.int64)
    gather_resize_normalize(images, idx, (224, 224))  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        gather_resize_normalize(images, idx, (224, 224))
    dt = (time.perf_counter() - t0) / 5
    print(f"resize ({'native' if HAVE_NATIVE else 'numpy'}): 256 imgs "
          f"256->224 in {dt*1e3:.0f} ms ({256/dt:,.0f} img/s host-side)")


def bench_osod():
    import copy

    from runia_core_tpu.evaluation import open_set
    from tests.test_open_set import TestNativeOsodParity

    nd = 200_000
    image_ids, bb, recs = TestNativeOsodParity._random_problem(
        0, nd=nd, n_img=2000, max_gt=12
    )
    npos = int(sum((~r["difficult"]).sum() for r in recs.values()))
    label = "native" if open_set.HAVE_NATIVE_OSOD else "python"
    t0 = time.perf_counter()
    open_set._greedy_match(image_ids, bb, copy.deepcopy(recs), 0.5, npos, False)
    dt = time.perf_counter() - t0
    print(f"osod greedy match ({label}): {nd:,} dets in {dt*1e3:.0f} ms "
          f"({nd/dt:,.0f} det/s host-side)")


BENCHES = {
    "entropy": bench_entropy,
    "nms": bench_nms,
    "ring": bench_ring,
    "moe": bench_moe,
    "decode": bench_decode,
    "llama": bench_llama,
    "objects": bench_objects,
    "resize": bench_resize,
    "osod": bench_osod,
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(BENCHES) if which == "all" else [which]
    print(f"backend: {jax.devices()[0].platform} ({len(jax.devices())} device(s))")
    for name in names:
        BENCHES[name]()


if __name__ == "__main__":
    main()
