"""Per-step device-time + byte-traffic profile of the production-size Llama
decode leg (the HBM-bound serving path).

The bench leg (bench.py::measure_llm_decode) reports ~48% of the 819 GB/s
v5e HBM peak; weight streaming alone predicts ~2.9 ms/step but the measured
step is ~6 ms. This profiler answers where the remainder goes:

1. ``weight-stream ceiling`` — a chain of batch-16 skinny matmuls reading
   the same total weight bytes as one decode step: the *practical* GB/s a
   [16, d] x [d, f] bf16 matmul mix can extract (the realistic 100% mark —
   skinny matmuls cannot always saturate the DMA pipeline).
2. ``decode-only scan`` — prefill runs outside the timed program; the timed
   program is a K-step lax.scan of pure decode steps. XLA's compiled cost
   analysis reports the program's total "bytes accessed": if that exceeds
   (weights + KV + activations) x K, the compiler is moving something we
   didn't ask for (e.g. a per-step cache copy from a failed in-place
   dynamic_update_slice).
3. The same scan with the uniform fast path (no token_valid / positions),
   isolating the cost of the masked-attention decode path the batched
   generator uses.

Timing uses utils.profiling.benchmark (two enqueue windows differenced —
the only sound recipe over the tunneled device, see CLAUDE.md).

Run:  python benchmarks/profile_decode.py   (real TPU, one process)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

HBM_PEAK = 819e9
B, PROMPT, STEPS = 16, 64, 64


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    import bench
    from runia_core_tpu.models.transformer import init_cache
    from runia_core_tpu.utils.profiling import benchmark

    st = bench._get_prod_llama()
    model, params = st["model"], st["params"]
    cfg = bench._PROD_CFG
    weight_bytes = st["weight_bytes"]
    total = PROMPT + STEPS

    # ---- 1. weight-stream ceiling: batch-16 skinny matmul chain ---------
    # Mimic one decode step's matmul mix per layer: d->3d (qkv-ish),
    # d->d (o), d->2f (gate+up), f->d (down); chain layers so nothing is
    # CSE'd or reordered away.
    d, f, L = cfg["d_model"], cfg["hidden_dim"], cfg["num_layers"]
    hd = d // cfg["num_heads"]
    qkv_out = (cfg["num_heads"] + 2 * cfg["num_kv_heads"]) * hd
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)

    lm_head = mk(d, cfg["vocab_size"])
    x0 = mk(B, d)

    def run_chain(name, per_layer_shapes, body):
        Ws = [tuple(mk(*s) for s in per_layer_shapes) for _ in range(L)]
        flat = [w for layer in Ws for w in layer]
        n = len(per_layer_shapes)

        def stream(x, *flat):
            for i in range(L):
                x = body(x, flat[i * n:(i + 1) * n])
            return (x @ lm_head).sum()

        compiled = jax.jit(stream).lower(x0, *flat).compile()
        fl, by = cost(compiled)
        _, sec = benchmark(jax.jit(stream), x0, *flat, iters=30)
        print(f"  {name:28s} bytes {by/1e9:.2f} GB  {sec*1e3:6.2f} ms  "
              f"-> {by/sec/1e9:4.0f} GB/s = {by/sec/HBM_PEAK:.1%} of peak")
        return by / sec / 1e9

    print(f"== weight-stream ceiling (batch-{B} bf16 matmul chains) ==")
    nh, nkv = cfg["num_heads"], cfg["num_kv_heads"]

    # Exact decode matmul mix: q,k,v,o,gate,up,down as 7 separate kernels,
    # with real dataflow so nothing is DCE'd (every product feeds x).
    def body7(x, w):
        wq, wk, wv, wo, wg, wu, wd = w
        q = x @ wq                                   # (B, d)
        kv = jnp.concatenate([x @ wk, x @ wv], 1)    # (B, 2*nkv*hd) = (B, d)
        x = x + q * 1e-6 + kv * 1e-6
        x = x + (x @ wo) * 1e-6
        x = x + (((x @ wg) * (x @ wu)) @ wd) * 1e-6
        return x

    run_chain(
        "7 kernels/layer (as-built)",
        [(d, nh * hd), (d, nkv * hd), (d, nkv * hd), (d, d),
         (d, f), (d, f), (f, d)],
        body7,
    )

    # Fused mix: one qkv matmul, one gate+up matmul, o, down.
    def body4(x, w):
        wqkv, wo, wgu, wd = w
        qkv = x @ wqkv                               # (B, (nh+2nkv)*hd)
        x = x + qkv[:, :d] * 1e-6 + qkv[:, d:d + d] * 1e-6
        x = x + (x @ wo) * 1e-6
        gu = x @ wgu                                 # (B, 2f)
        x = x + ((gu[:, :f] * gu[:, f:]) @ wd) * 1e-6
        return x

    ceiling_gbs = run_chain(
        "4 kernels/layer (qkv+gu fused)",
        [(d, qkv_out), (d, d), (d, 2 * f), (f, d)],
        body4,
    )

    # ---- 2./3. decode-only K-step scan ----------------------------------
    tokens = jnp.asarray(rng.randint(1, cfg["vocab_size"], (B, PROMPT)),
                         jnp.int32)

    @jax.jit
    def prefill(params, tokens):
        cache = init_cache(model, B, total)
        logits, _, _, cache = model.apply(
            params, tokens, cache, jnp.int32(0), assume_prefill=True
        )
        return cache, logits[:, -1, :]

    cache0, logits0 = prefill(params, tokens)
    jax.device_get(logits0[0, :1])

    def decode_scan(masked):
        def run(params, cache, step_logits):
            def body(carry, step):
                cache, step_logits = carry
                next_tok = jnp.argmax(step_logits, axis=-1)
                kwargs = {}
                if masked:
                    gen_valid = jnp.arange(STEPS)[None, :] <= step
                    kv_valid = jnp.concatenate(
                        [jnp.ones((B, PROMPT), bool),
                         jnp.broadcast_to(gen_valid, (B, STEPS))], axis=1)
                    kwargs = {"token_valid": kv_valid,
                              "positions": jnp.full((B, 1), PROMPT) + step}
                new_logits, _, _, cache = model.apply(
                    params, next_tok[:, None], cache,
                    jnp.int32(PROMPT) + step, **kwargs)
                return (cache, new_logits[:, 0, :]), next_tok
            (_, last), toks = jax.lax.scan(
                body, (cache, step_logits), jnp.arange(STEPS))
            return toks, last
        return run

    kv_bytes_step = (B * cfg["num_layers"] * 2 * (PROMPT + STEPS / 2)
                     * cfg["num_kv_heads"] * (d // cfg["num_heads"]) * 2)
    ideal = STEPS * (weight_bytes + kv_bytes_step)
    for masked in (True, False):
        run = decode_scan(masked)
        compiled = jax.jit(run).lower(params, cache0, logits0).compile()
        fl, by = cost(compiled)
        _, sec = benchmark(jax.jit(run), params, cache0, logits0, iters=4)
        name = "masked (generator path)" if masked else "uniform fast path"
        print(f"== decode-only {STEPS}-step scan: {name} ==")
        print(f"  {sec/STEPS*1e3:6.2f} ms/step  {B*STEPS/sec:,.0f} tok/s  "
              f"program bytes {by/1e9:.1f} GB "
              f"(ideal W+KV {ideal/1e9:.1f} GB, x{by/ideal:.2f})")
        print(f"  achieved {by/sec/1e9:.0f} GB/s raw | "
              f"{ideal/sec/1e9:.0f} GB/s useful "
              f"({ideal/sec/HBM_PEAK:.1%} of peak, "
              f"{ideal/sec/1e9/ceiling_gbs:.1%} of matmul ceiling)")


if __name__ == "__main__":
    main()
