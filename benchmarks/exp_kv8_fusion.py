"""Does XLA fuse the int8->bf16 KV dequantize into the attention dots?

Three candidate shapes for the KV8 decode attention read path, measured on
the real chip at the production decode geometry (B=16, L=320 cache rows,
G=8 kv heads, rep=2, D=128, 22 layers' worth of cache chained so the
window is resolvable):

  A. current   — k_all = k_q.astype(bf16) * scale[..., None]; einsum(q, k_all)
  B. restruct  — logits = einsum(q, k_q.astype(bf16)) * scale  (scale on the
                 O(K) logits, not the O(K*D) cache); probs * v_scale before
                 the V einsum.
  C. bf16 ref  — plain bf16 cache einsum (the int8+bf16KV leg's read).

If XLA fuses the convert into the dot, B's program bytes ~= int8 cache
bytes; if it materializes, B ~= A and a Pallas kernel is required.

All tensors are generated ON DEVICE (host->device uploads of a GB-scale
cache over the tunnel take tens of minutes — the first version of this
experiment died that way).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from runia_core_tpu.utils.profiling import benchmark

B, L, G, REP, D, NLAYER = 16, 320, 8, 2, 128, 22


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("bytes accessed", 0.0))


def main():
    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 5)
        kq = jax.random.randint(ks[0], (NLAYER, B, L, G, D), -127, 128,
                                jnp.int8)
        vq = jax.random.randint(ks[1], (NLAYER, B, L, G, D), -127, 128,
                                jnp.int8)
        sk = jax.random.uniform(ks[2], (NLAYER, B, L, G)) / 127
        sv = jax.random.uniform(ks[3], (NLAYER, B, L, G)) / 127
        q = jax.random.normal(ks[4], (B, 1, G, REP, D), jnp.bfloat16)
        return kq, vq, sk, sv, q

    kq, vq, ks_, vs_, q = gen(jax.random.key(0))
    kb = jax.jit(lambda x: x.astype(jnp.bfloat16))(kq)
    vb = jax.jit(lambda x: x.astype(jnp.bfloat16))(vq)
    jax.device_get(q[0, 0, 0, 0, :1])  # drain
    print("device arrays ready", flush=True)

    int8_bytes = NLAYER * 2 * B * L * G * D
    bf16_bytes = 2 * int8_bytes

    def attn_from(k_all, v_all):
        logits = jnp.einsum("bqgrd,bkgd->bgrqk", q, k_all) / np.sqrt(D)
        p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(jnp.bfloat16)
        return jnp.einsum("bgrqk,bkgd->bqgrd", p, v_all)

    def variant_a(kq, vq, ks, vs):
        acc = 0.0
        for i in range(NLAYER):
            k_all = kq[i].astype(jnp.bfloat16) * ks[i][..., None].astype(
                jnp.bfloat16)
            v_all = vq[i].astype(jnp.bfloat16) * vs[i][..., None].astype(
                jnp.bfloat16)
            acc += attn_from(k_all, v_all).astype(jnp.float32).sum()
        return acc

    def variant_b(kq, vq, ks, vs):
        acc = 0.0
        for i in range(NLAYER):
            logits = jnp.einsum(
                "bqgrd,bkgd->bgrqk", q, kq[i].astype(jnp.bfloat16)
            ) * (ks[i].transpose(0, 2, 1)[:, :, None, None, :] / np.sqrt(D))
            p = jax.nn.softmax(logits, -1)
            pw = (p * vs[i].transpose(0, 2, 1)[:, :, None, None, :]).astype(
                jnp.bfloat16)
            acc += jnp.einsum(
                "bgrqk,bkgd->bqgrd", pw, vq[i].astype(jnp.bfloat16)
            ).astype(jnp.float32).sum()
        return acc

    def variant_c(kb, vb, ks, vs):
        acc = 0.0
        for i in range(NLAYER):
            acc += attn_from(kb[i], vb[i]).astype(jnp.float32).sum()
        return acc

    for name, fn, args, ideal in [
        ("A current (dequant cache)", variant_a, (kq, vq, ks_, vs_),
         int8_bytes),
        ("B restructured (scale logits)", variant_b, (kq, vq, ks_, vs_),
         int8_bytes),
        ("C bf16 cache", variant_c, (kb, vb, ks_, vs_), bf16_bytes),
    ]:
        compiled = jax.jit(fn).lower(*args).compile()
        by = cost(compiled)
        print(f"{name}: compiled, bytes {by/1e9:.3f} GB "
              f"(cache ideal {ideal/1e9:.3f})", flush=True)
        _, sec = benchmark(jax.jit(fn), *args, iters=30)
        print(f"  {sec*1e3:.3f} ms  -> {by/sec/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
