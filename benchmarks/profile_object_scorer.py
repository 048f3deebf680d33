"""Per-stage device-time + roofline profile of the object scorer bench leg
(64 images x 20 detections, 256px, ResNet-18 bf16 backbone).

Same methodology as profile_rn50_224.py: cumulative prefix programs (XLA
DCEs everything past the returned stage), in-program lax.scan repetition to
amortize the tunnel's ~4 ms dispatch cost, and XLA compiled cost analysis
for the FLOP/byte rooflines.

Run:  python benchmarks/profile_object_scorer.py   (real TPU, one process)
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

BF16_PEAK = 197e12
HBM_PEAK = 819e9
B, IMG, MAX_DET = 64, 256, 20
REPEAT = 8


def repeat_in_program(f):
    def rep(*args):
        def body(carry, _):
            out = f(args[0] + carry, *args[1:])
            carry = jnp.asarray(out, jnp.float32).ravel()[0] * 1e-30
            return carry, ()
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPEAT)
        return carry
    return rep


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    from runia_core_tpu.detectors import MDLatentSpace
    from runia_core_tpu.extraction import build_object_scorer, pad_detections
    from runia_core_tpu.extraction.object_level_batched import (
        batched_roi_features,
    )
    from runia_core_tpu.models import ResNet18, build_tapped_forward
    from runia_core_tpu.utils.profiling import benchmark

    rng = np.random.RandomState(0)
    model = ResNet18(num_classes=10, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((B, IMG, IMG, 3))
    )
    forward = build_tapped_forward(model, variables, taps=("pre_pool",))
    md = MDLatentSpace()
    md.setup(rng.randn(1024, 512).astype(np.float32))

    def make_dets(n):
        xy = rng.rand(n, 2) * (IMG - 40)
        wh = rng.rand(n, 2) * 30 + 8
        return {
            "boxes": np.concatenate([xy, xy + wh], 1).astype(np.float32),
            "scores": rng.rand(n).astype(np.float32),
            "classes": rng.randint(0, 10, n),
        }

    padded = pad_detections([make_dets(MAX_DET) for _ in range(B)],
                            MAX_DET, (IMG, IMG))
    images = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
    boxes = jnp.asarray(padded.boxes)

    def fwd_only(x):
        _, taps = forward(x)
        return taps["pre_pool"]

    def fwd_roi(x, bx):
        _, taps = forward(x)
        fmap = jnp.transpose(taps["pre_pool"], (0, 3, 1, 2))
        return batched_roi_features((fmap,), bx, (IMG, IMG), (7,), -1)

    scorer = build_object_scorer(forward, md.state, output_sizes=(7,),
                                 img_shape=(IMG, IMG))

    def full(x, dets):
        return scorer(x, dets)

    stages = [
        ("forward", fwd_only, (images,)),
        ("+roi", fwd_roi, (images, boxes)),
        ("+score", full, (images, padded)),
    ]

    print(f"== object scorer {IMG}px b{B} x {MAX_DET} det: cumulative ==")
    prev_t, prev_f, prev_b = 0.0, 0.0, 0.0
    for name, f, args in stages:
        compiled = jax.jit(f).lower(*args).compile()
        fl, by = cost(compiled)
        jrep = jax.jit(repeat_in_program(f))
        _, sec = benchmark(jrep, *args, iters=8)
        sec /= REPEAT
        d_t, d_f, d_b = sec - prev_t, fl - prev_f, by - prev_b
        t_mxu, t_hbm = d_f / BF16_PEAK, d_b / HBM_PEAK
        bound = "MXU" if t_mxu > t_hbm else "HBM"
        print(f"  {name:8s} cum {sec*1e3:7.2f} ms | delta {d_t*1e3:7.2f} ms"
              f"  flops {d_f/1e9:7.1f} G  bytes {d_b/1e6:8.1f} MB"
              f"  roofline {max(t_mxu, t_hbm)*1e3:6.2f} ms ({bound}-bound)")
        prev_t, prev_f, prev_b = sec, fl, by

    total_roof = max(prev_f / BF16_PEAK, prev_b / HBM_PEAK)
    print(f"  TOTAL    {prev_t*1e3:7.2f} ms   flops {prev_f/1e12:.2f} T  "
          f"bytes {prev_b/1e9:.2f} GB  roofline {total_roof*1e3:.2f} ms  "
          f"-> {total_roof/prev_t:5.1%} of roofline achieved")
    print(f"  rate {B*MAX_DET/prev_t:,.0f} det/s")


if __name__ == "__main__":
    main()
