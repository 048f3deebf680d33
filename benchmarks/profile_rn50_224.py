"""Per-stage device-time + roofline profile of the LaREx ResNet-50 @224px
bench leg (the production-shape vision path).

Methodology: cumulative jitted programs — each returns only one stage's
output, so XLA dead-code-eliminates everything after it; the marginal time
between consecutive programs is that stage's fused device cost in-context.
Timing uses utils.profiling.benchmark (two enqueue windows differenced — the
only sound recipe over the tunneled device, see CLAUDE.md). Each program
also reports XLA's compiled cost analysis (FLOPs, bytes accessed), giving a
per-stage roofline verdict: compute-bound if flops/197T > bytes/819G, else
HBM-bound.

Run:  python benchmarks/profile_rn50_224.py   (real TPU, one process)
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

BF16_PEAK = 197e12
HBM_PEAK = 819e9
BATCH, IMG = 128, 224
MC_SAMPLES, BLOCK_SIZE, DROP_PROB = 16, 7, 0.3


REPEAT = 8


def repeat_in_program(f):
    """Run ``f`` REPEAT times inside ONE jitted program: a scalar data
    dependency chains iterations (defeats CSE), so a single dispatch pays
    the tunnel's ~4 ms host cost once while the device executes REPEAT
    copies — small stages stop hiding under the dispatch floor."""
    def rep(*args):
        def body(carry, _):
            out = f(args[0], args[1] + carry, *args[2:])
            carry = jnp.asarray(out, jnp.float32).ravel()[0] * 1e-30
            return carry, ()
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPEAT)
        return carry
    return rep


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    from runia_core_tpu.models import ResNet50
    from runia_core_tpu.sampling import mc_dropblock_samples
    from runia_core_tpu.ops.entropy import marginal_entropy
    from runia_core_tpu.utils.profiling import benchmark

    model = ResNet50(num_classes=1000, dtype=jnp.bfloat16)
    x0 = jnp.zeros((BATCH, IMG, IMG, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x0)
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, IMG, IMG, 3).astype(np.float32)
    )
    key = jax.random.key(7)

    # Backbone prefixes: returning only taps[name] lets XLA DCE the rest.
    def tap_fn(name):
        def f(v, x):
            _, taps = model.apply(v, x)
            return taps[name]
        return f

    def full_fn(v, x, k):
        _, taps = model.apply(v, x)
        mc = mc_dropblock_samples(k, taps["pre_pool"], MC_SAMPLES,
                                  BLOCK_SIZE, DROP_PROB, "Conv",
                                  channel_axis=3)
        return marginal_entropy(mc, 5)

    stages = [("stem", tap_fn("stem")), ("block1", tap_fn("block1")),
              ("block2", tap_fn("block2")), ("block3", tap_fn("block3")),
              ("block4", tap_fn("block4"))]

    print(f"== LaREx RN50 @{IMG}px b{BATCH} bf16: cumulative stages ==")
    prev_t, prev_f, prev_b = 0.0, 0.0, 0.0
    rows = []
    for name, f in stages:
        compiled = jax.jit(f).lower(variables, imgs).compile()
        fl, by = cost(compiled)
        jrep = jax.jit(repeat_in_program(f))
        _, sec = benchmark(jrep, variables, imgs, iters=8)
        sec /= REPEAT
        rows.append((name, sec, fl, by))
        d_t, d_f, d_b = sec - prev_t, fl - prev_f, by - prev_b
        t_mxu, t_hbm = d_f / BF16_PEAK, d_b / HBM_PEAK
        bound = "MXU" if t_mxu > t_hbm else "HBM"
        print(f"  {name:8s} cum {sec*1e3:7.2f} ms | delta {d_t*1e3:7.2f} ms"
              f"  flops {d_f/1e9:7.1f} G  bytes {d_b/1e6:8.1f} MB"
              f"  roofline {max(t_mxu, t_hbm)*1e3:6.2f} ms ({bound}-bound)")
        prev_t, prev_f, prev_b = sec, fl, by

    # MC-DropBlock + entropy on top of the full backbone.
    compiled = jax.jit(full_fn).lower(variables, imgs, key).compile()
    fl, by = cost(compiled)
    jrep = jax.jit(repeat_in_program(full_fn))
    _, sec = benchmark(jrep, variables, imgs, key, iters=8)
    sec /= REPEAT
    d_t, d_f, d_b = sec - prev_t, fl - prev_f, by - prev_b
    t_mxu, t_hbm = d_f / BF16_PEAK, d_b / HBM_PEAK
    bound = "MXU" if t_mxu > t_hbm else "HBM"
    print(f"  {'mc+ent':8s} cum {sec*1e3:7.2f} ms | delta {d_t*1e3:7.2f} ms"
          f"  flops {d_f/1e9:7.1f} G  bytes {d_b/1e6:8.1f} MB"
          f"  roofline {max(t_mxu, t_hbm)*1e3:6.2f} ms ({bound}-bound)")

    total_roof = max(fl / BF16_PEAK, by / HBM_PEAK)
    print(f"  TOTAL    {sec*1e3:7.2f} ms   program flops {fl/1e12:.2f} T  "
          f"bytes {by/1e9:.2f} GB  roofline {total_roof*1e3:.2f} ms  "
          f"-> {total_roof/sec:5.1%} of roofline achieved")
    print(f"  rate {BATCH/sec:,.0f} img/s")


if __name__ == "__main__":
    main()
