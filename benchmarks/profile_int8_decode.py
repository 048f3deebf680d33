"""Where does the int8+KV8 decode step spend its time?

The bench leg (bench.py::measure_llm_decode_int8) reports 4,616 tok/s =
1.40x bf16 at 48% HBM utilization; byte counting says ~1.9x is available
(int8 weights = 1.17 GB/step vs bf16's 2.34 GB). This profiler decomposes
the gap with decode-only scans (no prefill, no host fetch in the window):

1. ``int8 weight-stream ceiling`` — a chain of quant_matmul calls reading
   the same int8 bytes as one decode step: the practical GB/s the Pallas
   int8 kernel extracts at batch 16 (its own roofline, separate from the
   bf16 matmul ceiling).
2. decode-only 64-step scans over the four weight/KV combinations:
   bf16+bf16KV, int8+bf16KV, int8+KV8, bf16+KV8 — the deltas isolate the
   weight-quant win from the KV-quant term (and expose whether the KV8
   dequantize materializes a full bf16 cache copy per step: the program
   "bytes accessed" would then carry an extra 2x cache term).

Timing uses utils.profiling.benchmark (enqueue-window differencing — the
only sound recipe over the tunneled device, see CLAUDE.md).

Run:  python benchmarks/profile_int8_decode.py   (real TPU, one process)
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
    from runia_core_tpu.models import LlamaLM, quantize_llama_params
    from runia_core_tpu.models.transformer import init_cache
    from runia_core_tpu.ops.quant_matmul import quant_matmul
    from runia_core_tpu.utils.profiling import benchmark

    st = bench._get_prod_llama()
    cfg = bench._PROD_CFG
    d, f, L = cfg["d_model"], cfg["hidden_dim"], cfg["num_layers"]
    nh, nkv = cfg["num_heads"], cfg["num_kv_heads"]
    hd = d // nh
    total = PROMPT + STEPS
    rng = np.random.RandomState(0)

    # ---- 1. int8 weight-stream ceiling: quant_matmul chain --------------
    def mkq(k, n):
        w = rng.randn(k, n).astype(np.float32)
        s = np.abs(w).max(0) / 127.0
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s.astype(np.float32))

    x0 = jnp.asarray(rng.randn(B, d).astype(np.float32), jnp.bfloat16)
    shapes = [(d, nh * hd), (d, nkv * hd), (d, nkv * hd), (d, d),
              (d, f), (d, f), (f, d)]
    Ws = [[mkq(*s) for s in shapes] for _ in range(L)]
    flat = [t for layer in Ws for pair in layer for t in pair]
    lm_q, lm_s = mkq(d, cfg["vocab_size"])
    int8_bytes = sum(q.size for layer in Ws for q, _ in layer) + lm_q.size

    def chain(x, *flat):
        for i in range(L):
            w = flat[i * 14:(i + 1) * 14]
            q = quant_matmul(x, w[0], w[1])
            k = quant_matmul(x, w[2], w[3])
            v = quant_matmul(x, w[4], w[5])
            x = x + q * 1e-6 + jnp.concatenate([k, v], 1) * 1e-6
            x = x + quant_matmul(x, w[6], w[7]) * 1e-6
            g = quant_matmul(x, w[8], w[9])
            u = quant_matmul(x, w[10], w[11])
            x = x + quant_matmul(g * u, w[12], w[13]) * 1e-6
        return quant_matmul(x, lm_q, lm_s).sum()

    compiled = jax.jit(chain).lower(x0, *flat).compile()
    _, by = cost(compiled)
    _, sec = benchmark(jax.jit(chain), x0, *flat, iters=30)
    print(f"== int8 weight-stream ceiling (batch-{B} quant_matmul chain) ==")
    print(f"  int8 bytes {int8_bytes/1e9:.2f} GB  {sec*1e3:6.2f} ms  "
          f"-> {int8_bytes/sec/1e9:4.0f} GB/s useful = "
          f"{int8_bytes/sec/HBM_PEAK:.1%} of peak "
          f"(program bytes {by/1e9:.2f} GB)")
    sys.stdout.flush()

    # ---- 2. decode-only scans over weight/KV combinations ---------------
    tokens = jnp.asarray(rng.randint(1, cfg["vocab_size"], (B, PROMPT)),
                         jnp.int32)
    qparams = quantize_llama_params(st["params"], on_device=True)

    def leg(name, quantized, quantized_kv):
        model = LlamaLM(**cfg, dtype=jnp.bfloat16, quantized=quantized,
                        quantized_kv=quantized_kv)
        params = qparams if quantized else st["params"]
        leaves = jax.tree_util.tree_leaves(params)
        wbytes = sum(p.size * p.dtype.itemsize for p in leaves)
        kv_item = 1 if quantized_kv else 2
        kv_scale = 4 if quantized_kv else 0  # f32 scale per (B, pos, G)

        @jax.jit
        def prefill(params, tokens):
            cache = init_cache(model, B, total)
            logits, _, _, cache = model.apply(
                params, tokens, cache, jnp.int32(0))
            return cache, logits[:, -1, :]

        cache0, logits0 = prefill(params, tokens)
        jax.device_get(logits0[0, :1])

        def run(params, cache, step_logits):
            def body(carry, step):
                cache, step_logits = carry
                next_tok = jnp.argmax(step_logits, axis=-1)
                new_logits, _, _, cache = model.apply(
                    params, next_tok[:, None], cache, jnp.int32(PROMPT) + step)
                return (cache, new_logits[:, 0, :]), next_tok

            (_, last), toks = jax.lax.scan(
                body, (cache, step_logits), jnp.arange(STEPS))
            return toks, last

        compiled = jax.jit(run).lower(params, cache0, logits0).compile()
        _, by = cost(compiled)
        _, sec = benchmark(jax.jit(run), params, cache0, logits0, iters=4)
        kv_read = (B * L * 2 * (PROMPT + STEPS / 2) * nkv * hd * kv_item
                   + B * L * 2 * (PROMPT + STEPS / 2) * nkv * kv_scale)
        ideal = STEPS * (wbytes + kv_read)
        print(f"== {name}: {STEPS}-step decode scan ==")
        print(f"  {sec/STEPS*1e3:6.2f} ms/step  {B*STEPS/sec:,.0f} tok/s  "
              f"weights {wbytes/1e9:.2f} GB  program bytes {by/1e9:.1f} GB "
              f"(ideal W+KV/step {ideal/STEPS/1e9:.2f} GB, x{by/ideal:.2f})")
        print(f"  useful {ideal/sec/1e9:.0f} GB/s = "
              f"{ideal/sec/HBM_PEAK:.1%} of peak")
        sys.stdout.flush()
        return sec / STEPS

    t_bf16 = leg("bf16 + bf16 KV", False, False)
    t_i8 = leg("int8 + bf16 KV", True, False)
    t_i8k8 = leg("int8 + KV8", True, True)
    t_bfk8 = leg("bf16 + KV8", False, True)
    print("== deltas ==")
    print(f"  weight int8 win: {t_bf16 - t_i8:+.2f} ms/step "
          f"(expect ~-1.4 ms: 1.17 GB less at peak)")
    print(f"  KV8 term on int8: {t_i8k8 - t_i8:+.2f} ms/step "
          f"(expect ~-0.1 ms; positive = dequant overhead dominates)")
    print(f"  KV8 term on bf16: {t_bfk8 - t_bf16:+.2f} ms/step")
    print(f"  int8+KV8 vs bf16: {t_bf16/t_i8k8:.2f}x")


if __name__ == "__main__":
    main()
