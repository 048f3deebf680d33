"""Llama-family decoder LM (RMSNorm + RoPE + GQA + SwiGLU) with HF weights.

The reference's LLM-uncertainty path drives HF torch causal LMs
(runia_core/llm_uncertainty/scores.py:439-456, Llama-class models per the
project docs). This module is the TPU-native equivalent: a flax Llama
architecture honoring the same model contract as models/transformer.CausalLM
(``apply(params, tokens, cache, cache_index, token_valid=..., positions=...)
-> (logits, attentions, hiddens, new_cache)``), so llm/generate.JaxGenerator
and every downstream score (perplexity, RAUQ, eigen-score, semantic entropy)
run on it unchanged — plus ``convert_hf_llama`` which maps a
``transformers.LlamaForCausalLM`` checkpoint onto it (logits parity vs torch
is pinned by tests/test_llama.py).

Architecture notes (matching HF ``modeling_llama`` semantics):
  - RMSNorm in float32 with learned scale, no bias;
  - rotary position embeddings with the rotate-half convention
    (x1 = x[..., :d/2], x2 = x[..., d/2:], rotated = [-x2, x1]);
  - grouped-query attention: ``num_kv_heads`` K/V heads shared by
    ``num_heads // num_kv_heads`` query heads each;
  - SwiGLU MLP: down(silu(gate(x)) * up(x)), no biases;
  - optional tied embeddings (``tie_word_embeddings``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from runia_core_tpu.ops.quant_matmul import quant_matmul, quant_matmul_supported

__all__ = ["LlamaLM", "convert_hf_llama", "convert_hf_gemma",
           "convert_hf_mixtral", "quantize_llama_params",
           "fuse_quantized_llama_params"]


class QDense(nn.Module):
    """Weight-only int8 linear: kernel stored (in, out) int8 with a
    per-output-channel f32 scale; dequantized into the matmul dtype on the
    fly. Halves weight bytes vs bf16 — KV-cached decode is weight-bound, so
    this is HBM bandwidth, not just memory footprint."""

    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = False  # Qwen2-family q/k/v biases (kept f32)

    @nn.compact
    def __call__(self, x):
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros_init(), (x.shape[-1], self.features),
            jnp.int8,
        )
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,), jnp.float32
        )
        xd = x.astype(self.dtype)
        rows = int(np.prod(xd.shape[:-1]))
        if jax.default_backend() == "tpu" and quant_matmul_supported(
            rows, xd.shape[-1], self.features, xd.dtype.itemsize
        ):
            # Decode-regime path: keep the weights int8 all the way to VMEM.
            # The XLA expression below is loop-invariant in the decode scan,
            # so XLA hoists the dequantized full-width weight out of the
            # loop and every step re-reads bf16 — see ops/quant_matmul.py.
            out = quant_matmul(xd, kernel_q, scale)
        else:
            w = kernel_q.astype(self.dtype) * scale.astype(self.dtype)[None, :]
            out = xd @ w
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,),
                jnp.float32,
            )
            out = out + bias.astype(self.dtype)
        return out


class _QParams(nn.Module):
    """Declare one QDense-layout parameter set (kernel_q, scale[, bias])
    WITHOUT computing — the block fuses several projections into one
    dequant matmul while the per-projection parameter tree (checkpoint /
    converter layout, ``quantize_llama_params`` output) stays unchanged."""

    in_dim: int
    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kq = self.param(
            "kernel_q", nn.initializers.zeros_init(),
            (self.in_dim, self.features), jnp.int8,
        )
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32,
        ) if self.use_bias else None
        return kq, scale, bias


def _fused_quant_matmul(x, parts, dtype):
    """One int8 matmul over the column-concatenation of several QDense
    parameter sets. The concatenated int8 kernel/scale are loop-invariant,
    so XLA hoists them out of a decode scan and each step launches ONE
    Pallas dequant matmul instead of one per projection — at 1B scale the
    per-step launch count (7/layer) was the measured fixed floor of the
    quantized decode (benchmarks/profile_int8_decode.py)."""
    wq = jnp.concatenate([p[0] for p in parts], axis=1)
    scale = jnp.concatenate([p[1] for p in parts])
    xd = x.astype(dtype)
    rows = int(np.prod(xd.shape[:-1]))
    if jax.default_backend() == "tpu" and quant_matmul_supported(
        rows, xd.shape[-1], wq.shape[1], xd.dtype.itemsize
    ):
        out = quant_matmul(xd, wq, scale)
    else:
        out = xd @ (wq.astype(dtype) * scale.astype(dtype)[None, :])
    if any(p[2] is not None for p in parts):
        bias = jnp.concatenate([
            p[2] if p[2] is not None else jnp.zeros((p[1].shape[0],),
                                                    jnp.float32)
            for p in parts
        ])
        out = out + bias.astype(dtype)
    return out


def _rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin tables (B, T, head_dim) for the rotate-half convention."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, d/2)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: (B, T, H, d). cos/sin: (B, T, d) broadcast over heads."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, :, None, :] + rotated * sin[:, :, None, :]


def _flash_available(t: int) -> bool:
    """Pallas flash attention engages on TPU for prefill lengths >= one
    128-row query block; non-multiples are zero-padded up to the next block
    (shorter prompts: dense is cheap)."""
    return t >= 128 and jax.default_backend() == "tpu"


def _flash_blocks(t: int):
    """Largest power-of-two block sizes dividing the sequence (tuned on
    v5e: 512-query x 1024-key blocks are ~3x the default 128x128 at 8k)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = next(b for b in (512, 256, 128) if t % b == 0)
    bk = next(b for b in (1024, 512, 256, 128) if t % b == 0)
    return BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1)


class _LlamaBlock(nn.Module):
    num_heads: int
    num_kv_heads: int
    head_dim: int
    d_model: int
    hidden_dim: int
    rms_eps: float
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    quantized: bool = False
    fused_qkv: bool = False  # pre-fused qkv/gateup int8 kernels
    attn_bias: bool = False  # q/k/v projection biases (Qwen2 family)
    mlp_act: str = "silu"  # "gelu_tanh" for the Gemma family's GeGLU
    num_experts: int = 0  # >0: Mixtral-style sparse-MoE FFN (top-k routing)
    num_experts_per_tok: int = 2

    @nn.compact
    def __call__(self, x, mask, cos, sin, cache=None, cache_index=None,
                 flash_ok=False, assume_prefill=False):
        b, t, _ = x.shape
        # Norms always run in f32 (HF semantics); matmuls in self.dtype so
        # bf16 serving rides the MXU.
        h = nn.RMSNorm(epsilon=self.rms_eps, name="input_norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)

        if self.quantized:
            dense = lambda f, name, bias=False: QDense(
                f, dtype=self.dtype, use_bias=bias, name=name
            )
        else:
            dense = lambda f, name, bias=False: nn.Dense(
                f, use_bias=bias, dtype=self.dtype, name=name
            )
        ab = self.attn_bias
        nq = self.num_heads * self.head_dim
        nkv = self.num_kv_heads * self.head_dim
        if self.quantized and self.fused_qkv:
            # Pre-fused QKV (fuse_quantized_llama_params): ONE stored int8
            # kernel, one dequant-matmul launch. In-graph concatenation of
            # per-projection kernels does NOT work: XLA materializes the
            # concat inside the decode while-body every step (verified on
            # the optimized HLO), re-paying the weight bytes it was meant
            # to save.
            qkv = _fused_quant_matmul(
                h, [_QParams(self.d_model, nq + 2 * nkv, ab, name="qkv")()],
                self.dtype,
            )
            q, k, v = jnp.split(qkv, [nq, nq + nkv], axis=-1)
        else:
            q = dense(nq, "q", ab)(h)
            k = dense(nkv, "k", ab)(h)
            v = dense(nkv, "v", ab)(h)
        q = q.reshape(b, t, self.num_heads, self.head_dim)
        k = k.reshape(b, t, self.num_kv_heads, self.head_dim)
        v = v.reshape(b, t, self.num_kv_heads, self.head_dim)

        q = _apply_rope(q, cos, sin).astype(self.dtype)
        k = _apply_rope(k, cos, sin).astype(self.dtype)

        def cache_write(buf, val):
            """Insert val at the cache position(s). A scalar ``cache_index``
            writes all rows at one shared offset (the left-pad-aligned batch
            decode); a (B,) vector writes each row at its own offset (the
            continuous-batching engine, where every slot has its own
            timeline)."""
            if jnp.ndim(cache_index) == 0:
                start = (0, cache_index) + (0,) * (buf.ndim - 2)
                return jax.lax.dynamic_update_slice(buf, val, start)
            per_row = lambda b_row, v_row, i: jax.lax.dynamic_update_slice(
                b_row, v_row, (i,) + (0,) * (buf.ndim - 2)
            )
            return jax.vmap(per_row)(buf, val, cache_index)

        kv_scales = None
        if cache is not None and "k_scale" in cache:
            # KV8 cache: insert int8 values + per-(B, pos, G) scales. The
            # scales are NOT applied to the cache tensors — that would
            # materialize a full bf16 cache copy per step (measured 1.93 GB
            # program bytes vs 0.78 restructured at the production decode
            # geometry, benchmarks/exp_kv8_fusion.py). Instead the raw int8
            # values feed the attention dots (int8->bf16 is exact) and the
            # O(K) per-position scales are applied to the logits (k side)
            # and the attention probabilities (v side) below — the same
            # numbers, one cache-sized elementwise pass cheaper.
            def quant(x):
                s = jnp.maximum(
                    jnp.max(jnp.abs(x), axis=-1), 1e-8
                ).astype(jnp.float32) / 127.0
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127
                ).astype(jnp.int8)
                return xq, s

            k_q, k_s = quant(k)
            v_q, v_s = quant(v)
            new_kv = {
                "k": cache_write(cache["k"], k_q),
                "v": cache_write(cache["v"], v_q),
                "k_scale": cache_write(cache["k_scale"], k_s),
                "v_scale": cache_write(cache["v_scale"], v_s),
            }
            k_all = new_kv["k"].astype(self.dtype)
            v_all = new_kv["v"].astype(self.dtype)
            kv_scales = (new_kv["k_scale"], new_kv["v_scale"])
        elif cache is not None:
            k_cache = cache_write(cache["k"], k)
            v_cache = cache_write(cache["v"], v)
            k_all, v_all = k_cache, v_cache
            new_kv = {"k": k_cache, "v": v_cache}
        else:
            k_all, v_all = k, v
            new_kv = None

        # GQA: expand query heads into (kv_head, rep) groups.
        rep = self.num_heads // self.num_kv_heads
        if (
            self.use_flash and flash_ok and _flash_available(t)
            and (cache is None or assume_prefill)
        ):
            # Pallas flash attention: O(T) memory, no (B,H,T,T) tensor.
            # Attention probabilities are not materialized — a zero-width
            # placeholder keeps the tap layout; decode steps (cache path)
            # still emit real rows for RAUQ. With assume_prefill the cache
            # beyond this call's tokens is empty, so attending over just
            # (k, v) equals attending over the masked cache.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            # Zero-pad to a 128-row block multiple: causality keeps real
            # queries (< t) from seeing padded keys (>= t); padded query
            # rows are sliced off below.
            tp_len = -(-t // 128) * 128
            pad = tp_len - t
            qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
            kh = jnp.moveaxis(kp, 1, 2)  # (B, G, T', d) — never head-expanded
            vh = jnp.moveaxis(vp, 1, 2)
            qg = jnp.moveaxis(
                qp.reshape(b, tp_len, self.num_kv_heads, rep, self.head_dim),
                1, 3,
            )  # (B, G, rep, T', d)
            sm = 1.0 / float(np.sqrt(self.head_dim))
            blocks = _flash_blocks(tp_len)
            # One kernel call per query-head-in-group: K/V stay at GQA width
            # instead of being repeat-materialized to the full head count.
            ctx = jnp.stack(
                [
                    flash_attention(qg[:, :, r], kh, vh, causal=True,
                                    sm_scale=sm, block_sizes=blocks)
                    for r in range(rep)
                ],
                axis=2,
            )  # (B, G, rep, T', d)
            out = jnp.moveaxis(ctx, 3, 1)[:, :t].reshape(
                b, t, self.num_heads * self.head_dim
            )
            attn = jnp.zeros((b, self.num_heads, 0, k_all.shape[1]), jnp.float32)
        elif (
            self.use_flash and flash_ok and _flash_available(t)
            and cache is not None
        ):
            # Chunked prefill over a LIVE cache (the serving engine's
            # prefill path): the chunk's queries sit at global positions
            # cache_index + i and attend the cache prefix [0, ...] — the
            # valid-length flash kernel skips key blocks past each row's
            # window, so work scales with the written prefix, not max_ctx.
            # Emits the zero-width attention placeholder like the pure
            # prefill branch (decode steps still produce real rows).
            from runia_core_tpu.ops.flash_prefill import (
                flash_prefix_attention,
            )

            starts = jnp.broadcast_to(
                jnp.atleast_1d(cache_index).astype(jnp.int32), (b,)
            )
            if kv_scales is not None:
                # KV8: feed the raw int8 cache + per-key scales; the
                # kernel applies them on the logits / probabilities (the
                # same O(K) restructure as the dense path below).
                ksrc, vsrc = new_kv["k"], new_kv["v"]
                ks, vs = kv_scales
            else:
                ksrc, vsrc = k_all, v_all
                ks = vs = None
            ctx = flash_prefix_attention(
                jnp.moveaxis(q, 1, 2),            # (B, H, t, d)
                jnp.swapaxes(ksrc, 1, 2),         # (B, G, K, d)
                jnp.swapaxes(vsrc, 1, 2),
                starts, None, ks, vs,
                sm_scale=1.0 / float(np.sqrt(self.head_dim)),
            )
            out = jnp.moveaxis(ctx, 1, 2).reshape(
                b, t, self.num_heads * self.head_dim
            )
            attn = jnp.zeros((b, self.num_heads, 0, k_all.shape[1]), jnp.float32)
        else:
            qg = q.reshape(b, t, self.num_kv_heads, rep, self.head_dim)
            logits = jnp.einsum("bqgrd,bkgd->bgrqk", qg, k_all) / jnp.sqrt(
                self.head_dim * 1.0
            )
            if kv_scales is not None:
                # (B, K, G) -> (B, G, 1, 1, K): per-key dequant scale on the
                # O(K) logits instead of the O(K*D) cache.
                logits = logits * kv_scales[0].transpose(0, 2, 1)[
                    :, :, None, None, :
                ]
            logits = logits.reshape(b, self.num_heads, t, k_all.shape[1])
            logits = jnp.where(mask, logits.astype(jnp.float32), -1e30)
            attn = jax.nn.softmax(logits, axis=-1)  # f32 regardless of dtype
            attn = jnp.where(mask, attn, 0.0)
            ag = attn.reshape(b, self.num_kv_heads, rep, t, k_all.shape[1])
            if kv_scales is not None:
                ag = ag * kv_scales[1].transpose(0, 2, 1)[:, :, None, None, :]
            out = jnp.einsum(
                "bgrqk,bkgd->bqgrd", ag.astype(self.dtype), v_all
            ).reshape(b, t, self.num_heads * self.head_dim)
        x = x + dense(self.d_model, "o")(out)

        h2 = nn.RMSNorm(epsilon=self.rms_eps, name="post_attn_norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        if self.num_experts:
            mlp = self._moe_ffn(h2)
        else:
            if self.quantized and self.fused_qkv:
                gu = _fused_quant_matmul(h2, [
                    _QParams(self.d_model, 2 * self.hidden_dim,
                             name="gateup")(),
                ], self.dtype)
                gate, up = jnp.split(gu, 2, axis=-1)
            else:
                gate = dense(self.hidden_dim, "gate")(h2)
                up = dense(self.hidden_dim, "up")(h2)
            if self.mlp_act == "silu":
                act = nn.silu(gate)
            else:  # "gelu_tanh" — the Gemma family's GeGLU
                act = nn.gelu(gate, approximate=True)
            mlp = dense(self.d_model, "down")(act * up)
        return x + mlp, attn, new_kv

    def _moe_ffn(self, h):
        """Mixtral-style sparse-MoE SwiGLU FFN (modeling_mixtral.py
        MixtralSparseMoeBlock semantics: router softmax in f32, top-k
        renormalized, cast back to the hidden dtype; no token dropping).

        Computed as a dense einsum over ALL experts with the non-selected
        gates zeroed — exact (full-capacity) routing with zero gather or
        scatter, so every FLOP rides the MXU and the program shape is
        static. That spends num_experts/top_k x the selected-expert FLOPs;
        prefill at scale wants the expert-parallel dispatch path
        (parallel/moe.py::sharded_moe_ffn) instead — the documented
        single-chip exactness trade."""
        b, t, d = h.shape
        e, k = self.num_experts, self.num_experts_per_tok
        flat = h.reshape(b * t, d)
        router_logits = nn.Dense(
            e, use_bias=False, dtype=self.dtype, name="router"
        )(flat)
        probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
        topv, topi = jax.lax.top_k(probs, k)
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        # (BT, E) sparse gate matrix: routing weight where selected, else 0.
        gates = jnp.sum(
            jax.nn.one_hot(topi, e, dtype=jnp.float32) * topv[..., None],
            axis=1,
        ).astype(self.dtype)
        def expert_stack(name, shape):
            """(E, in, out) expert tensor; quantized mode stores int8 with
            one f32 scale per (expert, out-channel), dequantized into the
            einsum dtype (the QDense recipe on the stacked layout)."""
            if not self.quantized:
                return self.param(
                    name, nn.initializers.lecun_normal(), shape, self.dtype
                )
            q = self.param(
                name + "_q", nn.initializers.zeros_init(), shape, jnp.int8
            )
            scale = self.param(
                name + "_scale", nn.initializers.ones_init(),
                (shape[0], shape[2]), jnp.float32,
            )
            return q.astype(self.dtype) * scale[:, None, :].astype(self.dtype)

        w_gate = expert_stack("w_gate", (e, d, self.hidden_dim))
        w_up = expert_stack("w_up", (e, d, self.hidden_dim))
        w_down = expert_stack("w_down", (e, self.hidden_dim, d))
        hg = jnp.einsum("td,edh->teh", flat, w_gate)
        hu = jnp.einsum("td,edh->teh", flat, w_up)
        act = nn.silu(hg) if self.mlp_act == "silu" else nn.gelu(
            hg, approximate=True
        )
        y = jnp.einsum("teh,ehd->ted", act * hu, w_down)
        out = jnp.einsum("ted,te->td", y, gates)
        return out.reshape(b, t, d)


class LlamaLM(nn.Module):
    """Llama-family causal LM, drop-in for CausalLM in llm/generate.py.

    ``head_dim`` defaults to ``d_model // num_heads``; models like
    Llama-3.x set it explicitly in their HF config. ``max_len`` is the
    checkpoint's trained context window (HF ``max_position_embeddings``) —
    RoPE extrapolates mechanically beyond it, so JaxGenerator warns rather
    than fails when a generation would exceed it.
    """

    vocab_size: int
    num_layers: int = 2
    num_heads: int = 4
    num_kv_heads: int = 4
    d_model: int = 64
    hidden_dim: int = 128
    max_len: int = 256
    head_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    # Matmul compute dtype. bf16 is the production serving config (MXU-
    # native); norms, softmax, RoPE tables, and the returned logits /
    # attentions / hiddens stay f32 so downstream uncertainty numerics are
    # unaffected by the choice.
    dtype: jnp.dtype = jnp.float32
    # Pallas flash attention for purely-causal prefill on TPU (prompts
    # >= 128 tokens). Prefill attention probabilities are then NOT emitted
    # (zero-width placeholder); decode steps still produce real rows, so
    # per-step RAUQ aggregations keep working — leave False when the full
    # prompt attention matrix is needed (RAUQ rollout over the prompt).
    use_flash: bool = False
    # Weight-only int8: projection kernels stored int8 with per-channel
    # scales (see quantize_llama_params). Embeddings stay full precision.
    quantized: bool = False
    # KV8: store the KV cache int8 with one scale per (batch, position,
    # kv-head) — halves cache HBM vs bf16 (4x vs f32), which is the decode
    # bandwidth at long context. Dequantization fuses into the attention
    # reads; Q stays full precision.
    quantized_kv: bool = False
    # Pre-fused qkv / gate|up int8 kernels (fuse_quantized_llama_params):
    # one dequant-matmul launch where the per-projection layout pays three
    # — the per-step Pallas launch count is the quantized decode's fixed
    # floor. Params must carry "qkv"/"gateup" entries instead of
    # q/k/v/gate/up. quantized=True only.
    fused_qkv: bool = False
    # q/k/v projection biases — the Qwen2/Qwen2.5 family. o/gate/up/down
    # stay bias-free (as in those checkpoints). convert_hf_llama sets this
    # automatically when the checkpoint carries attention biases.
    attn_bias: bool = False
    # Sliding-window attention (Mistral v0.1 / fully-windowed Qwen2): each
    # query attends only to the last `sliding_window` positions. None =
    # full causal attention. Incompatible with use_flash (the Pallas
    # kernel is plain-causal) — flash silently falls back to dense.
    sliding_window: Optional[int] = None
    # Gemma-family deltas (set by convert_hf_gemma): scale the input
    # embedding by sqrt(d_model) (NOT foldable into the table — Gemma ties
    # embeddings, so the tied logits matmul must see the unscaled weights),
    # and GeGLU (gelu-tanh) instead of SwiGLU. Gemma's (1 + weight) RMSNorm
    # is folded into the scales at conversion time instead.
    embed_scale: bool = False
    mlp_act: str = "silu"
    # Mixtral-family sparse MoE: >0 replaces every block's SwiGLU MLP with
    # num_experts expert MLPs under top-(num_experts_per_tok) routing
    # (set by convert_hf_mixtral). 0 = dense MLP.
    num_experts: int = 0
    num_experts_per_tok: int = 2

    def _head_dim(self) -> int:
        return self.head_dim or self.d_model // self.num_heads

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        cache: Optional[Dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        token_valid: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        assume_prefill: bool = False,
    ):
        """Same contract as CausalLM.__call__ (see models/transformer.py).

        ``assume_prefill=True`` (static) asserts this call fills an EMPTY
        cache from slot 0 — the flash path may then attend over just this
        call's K/V instead of the whole cache buffer. JaxGenerator passes it
        on its prefill call for ``use_flash`` models; passing it on a
        chunked/mid-cache prefill silently drops the earlier context.
        """
        b, t = tokens.shape
        # Flash prefill only for the plain causal case: default positions,
        # no padding mask (custom positions would desync flash's built-in
        # causal structure from the RoPE phases), and no sliding window
        # (the Pallas kernel computes plain causal attention).
        flash_ok = (
            token_valid is None and positions is None
            and self.sliding_window is None
        )
        q_phys = None
        if cache is None:
            if positions is None:
                if token_valid is not None:
                    positions = jnp.maximum(
                        jnp.cumsum(token_valid.astype(jnp.int32), axis=1) - 1, 0
                    )
                else:
                    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
            mask = jnp.tril(jnp.ones((t, t), bool))[None, None, :, :]
            if token_valid is not None:
                mask = mask & token_valid[:, None, None, :]
        else:
            kv_len = cache["layers"][0]["k"].shape[1]
            if jnp.ndim(cache_index) == 0:
                q_phys = cache_index + jnp.arange(t)  # shared physical clock
                if positions is None:
                    positions = jnp.broadcast_to(q_phys[None, :], (b, t))
                mask = (
                    jnp.arange(kv_len)[None, None, None, :]
                    <= q_phys[None, None, :, None]
                )
            else:
                # Per-slot physical clocks (continuous batching): each batch
                # row writes and attends at its own cache offset.
                q_phys = cache_index[:, None] + jnp.arange(t)[None, :]  # (B, t)
                if positions is None:
                    positions = q_phys
                mask = (
                    jnp.arange(kv_len)[None, None, None, :]
                    <= q_phys[:, None, :, None]
                )
            if token_valid is not None:
                mask = mask & token_valid[:, None, None, :]

        if self.sliding_window is not None:
            # Keep kv only within the last `window` positions of each query
            # (q - k < window, the HF band convention). In cache mode the
            # window runs over PHYSICAL slots, which equals the logical
            # distance row-by-row: pads sit at the front, so query and kv
            # of the same sequence share one offset.
            w = int(self.sliding_window)
            if cache is None:
                delta = positions[:, None, :, None] - positions[:, None, None, :]
            elif jnp.ndim(cache_index) == 0:
                kv_len = cache["layers"][0]["k"].shape[1]
                delta = (
                    q_phys[None, None, :, None]
                    - jnp.arange(kv_len)[None, None, None, :]
                )
            else:
                kv_len = cache["layers"][0]["k"].shape[1]
                delta = (
                    q_phys[:, None, :, None]
                    - jnp.arange(kv_len)[None, None, None, :]
                )
            mask = mask & (delta < w)

        cos, sin = _rope_cos_sin(positions, self._head_dim(), self.rope_theta)

        embed = nn.Embed(
            self.vocab_size, self.d_model, dtype=self.dtype, name="embed"
        )
        x = embed(tokens)
        if self.embed_scale:
            x = x * jnp.asarray(self.d_model**0.5, x.dtype)
        hiddens = [x]
        attns = []
        new_layer_caches = []
        for i in range(self.num_layers):
            layer_cache = cache["layers"][i] if cache is not None else None
            x, attn, new_kv = _LlamaBlock(
                self.num_heads, self.num_kv_heads, self._head_dim(),
                self.d_model, self.hidden_dim, self.rms_eps, self.dtype,
                self.use_flash, self.quantized, self.fused_qkv,
                self.attn_bias,
                self.mlp_act, self.num_experts, self.num_experts_per_tok,
                name=f"block_{i}",
            )(x, mask, cos, sin, layer_cache, cache_index,
              flash_ok=flash_ok, assume_prefill=assume_prefill)
            hiddens.append(x)
            attns.append(attn)
            if new_kv is not None:
                new_layer_caches.append(new_kv)
        x = nn.RMSNorm(epsilon=self.rms_eps, name="norm_f")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        # HF convention: the LAST hidden_states entry is the post-final-norm
        # output (modeling_llama appends norm(h) after the layer loop) —
        # eigen_score's layer indexing must agree across backends.
        hiddens[-1] = x
        if self.tie_embeddings:
            logits = embed.attend(x)
        elif self.quantized:
            logits = QDense(self.vocab_size, dtype=self.dtype, name="lm_head")(x)
        else:
            logits = nn.Dense(
                self.vocab_size, use_bias=False, dtype=self.dtype,
                name="lm_head",
            )(x)
        logits = logits.astype(jnp.float32)

        new_cache = {"layers": new_layer_caches} if cache is not None else None
        hiddens_out = jnp.stack(hiddens).astype(jnp.float32)
        return logits, jnp.stack(attns), hiddens_out, new_cache


def _t(w, dtype=np.float32) -> np.ndarray:
    """torch (out, in) weight -> flax (in, out) kernel."""
    return np.asarray(w.detach().cpu().float().numpy().T).astype(dtype)


def _vec(w, dtype=np.float32) -> np.ndarray:
    return np.asarray(w.detach().cpu().float().numpy()).astype(dtype)


def convert_hf_llama(hf_model, max_len: Optional[int] = None,
                     dtype=jnp.float32, use_flash: bool = False,
                     quantize: bool = False, quantize_kv: bool = False):
    """Map a ``transformers.LlamaForCausalLM`` onto (LlamaLM, params).

    Reads the HF config for the architecture hyperparameters and transposes
    each torch ``(out, in)`` projection into a flax ``(in, out)`` kernel
    (``dtype=jnp.bfloat16`` stores kernels/embeddings in bf16 — half the
    weight HBM — and selects the MXU-native matmul
    compute dtype for serving). Works for any Llama-family checkpoint
    (TinyLlama, Llama-2/3.x, Vicuna…); rope scaling variants beyond plain
    ``rope_theta`` are not implemented and raise. Logits parity vs the torch
    forward is pinned by tests.
    """
    cfg = hf_model.config
    scaling = getattr(cfg, "rope_scaling", None)
    if scaling not in (None, {}) and scaling.get("rope_type", scaling.get("type")) not in (
        None, "default",
    ):
        raise NotImplementedError(f"rope_scaling {scaling!r} not supported")
    # Sliding-window attention: supported uniformly across layers
    # (Mistral v0.1 — always windowed; Qwen2 — windowed when
    # use_sliding_window=True). Qwen2's max_window_layers can make only
    # the layers >= that index windowed; a MIXED stack is a different
    # per-layer forward and raises.
    window = None
    sw = getattr(cfg, "sliding_window", None)
    if sw:
        if hasattr(cfg, "use_sliding_window"):  # Qwen2-style gate
            if cfg.use_sliding_window:
                mwl = getattr(cfg, "max_window_layers", 0) or 0
                if 0 < mwl < cfg.num_hidden_layers:
                    raise NotImplementedError(
                        f"mixed per-layer sliding windows (max_window_layers="
                        f"{mwl} of {cfg.num_hidden_layers})"
                    )
                if mwl < cfg.num_hidden_layers:
                    window = int(sw)
        else:  # Mistral-style: window always active
            window = int(sw)
    if window is not None and use_flash:
        raise NotImplementedError(
            "use_flash with sliding-window attention (the flash kernel is "
            "plain-causal); convert with use_flash=False"
        )
    attn_bias = hf_model.model.layers[0].self_attn.q_proj.bias is not None
    model = LlamaLM(
        vocab_size=cfg.vocab_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        d_model=cfg.hidden_size,
        hidden_dim=cfg.intermediate_size,
        max_len=max_len or cfg.max_position_embeddings,
        head_dim=getattr(cfg, "head_dim", None)
        or cfg.hidden_size // cfg.num_attention_heads,
        rope_theta=float(getattr(cfg, "rope_theta", 10000.0)),
        rms_eps=float(cfg.rms_norm_eps),
        tie_embeddings=bool(cfg.tie_word_embeddings),
        dtype=dtype,
        use_flash=use_flash,
        quantized=quantize,
        quantized_kv=quantize_kv,
        attn_bias=attn_bias,
        sliding_window=window,
    )

    hf = hf_model.model  # LlamaModel inside LlamaForCausalLM
    # Kernels and embeddings are STORED in the compute dtype (bf16 halves
    # weight HBM footprint and decode bandwidth — decode is weight-bound);
    # RMSNorm scales stay f32 since the norms always compute in f32.
    wd = dtype if dtype != jnp.float32 else np.float32  # ml_dtypes-compatible
    p: Dict = {
        "embed": {"embedding": _vec(hf.embed_tokens.weight, wd)},
        "norm_f": {"scale": _vec(hf.norm.weight)},
    }
    for i, layer in enumerate(hf.layers):
        p[f"block_{i}"] = {
            "input_norm": {"scale": _vec(layer.input_layernorm.weight)},
            "post_attn_norm": {
                "scale": _vec(layer.post_attention_layernorm.weight)
            },
            "q": {"kernel": _t(layer.self_attn.q_proj.weight, wd)},
            "k": {"kernel": _t(layer.self_attn.k_proj.weight, wd)},
            "v": {"kernel": _t(layer.self_attn.v_proj.weight, wd)},
            "o": {"kernel": _t(layer.self_attn.o_proj.weight, wd)},
            "gate": {"kernel": _t(layer.mlp.gate_proj.weight, wd)},
            "up": {"kernel": _t(layer.mlp.up_proj.weight, wd)},
            "down": {"kernel": _t(layer.mlp.down_proj.weight, wd)},
        }
        if attn_bias:
            for proj in ("q", "k", "v"):
                p[f"block_{i}"][proj]["bias"] = _vec(
                    getattr(layer.self_attn, f"{proj}_proj").bias
                )
    if not model.tie_embeddings:
        p["lm_head"] = {"kernel": _t(hf_model.lm_head.weight, wd)}
    params = {"params": p}
    if quantize:
        params = quantize_llama_params(params)
    return model, params


def convert_hf_gemma(hf_model, max_len: Optional[int] = None,
                     dtype=jnp.float32, use_flash: bool = False,
                     quantize: bool = False, quantize_kv: bool = False):
    """Map a ``transformers.GemmaForCausalLM`` onto (LlamaLM, params).

    Gemma is the Llama layout with three forward deltas: the input
    embedding scales by sqrt(d_model) (``embed_scale=True`` — not foldable
    into the tied table), the MLP is GeGLU (gelu-tanh on the gate), and
    RMSNorm multiplies by ``1 + weight`` — folded into the flax scales here
    so the module stays unchanged. Gemma-2's attention/final logit
    soft-capping and alternating sliding windows are different forwards and
    raise. Logits parity vs torch is pinned by tests/test_llama.py.
    """
    cfg = hf_model.config
    if getattr(cfg, "attn_logit_softcapping", None) or getattr(
        cfg, "final_logit_softcapping", None
    ) or (getattr(cfg, "sliding_window", None) and getattr(
        cfg, "use_sliding_window", True
    )):
        raise NotImplementedError(
            "Gemma-2-style soft-capping / sliding-window attention is not "
            "implemented; Gemma-1-style full-attention checkpoints only"
        )
    # GemmaMLP in the installed transformers builds ACT2FN[cfg.hidden_act];
    # hidden_activation is a legacy alias that the modeling code ignores.
    # Key off the field that drives the torch forward we pin parity
    # against, and refuse configs where the two disagree rather than
    # silently converting a different activation than torch runs.
    act = getattr(cfg, "hidden_act", None) or "gelu_pytorch_tanh"
    legacy = getattr(cfg, "hidden_activation", None)
    if legacy is not None and legacy != act:
        raise ValueError(
            f"Gemma config disagrees with itself: hidden_act={act!r} (what "
            f"the torch forward runs) vs hidden_activation={legacy!r}; fix "
            "the checkpoint config before converting"
        )
    if act not in ("gelu_pytorch_tanh", "gelu_new"):
        raise NotImplementedError(f"Gemma hidden activation {act!r}")
    model = LlamaLM(
        vocab_size=cfg.vocab_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        d_model=cfg.hidden_size,
        hidden_dim=cfg.intermediate_size,
        max_len=max_len or cfg.max_position_embeddings,
        head_dim=getattr(cfg, "head_dim", None)
        or cfg.hidden_size // cfg.num_attention_heads,
        rope_theta=float(getattr(cfg, "rope_theta", 10000.0)),
        rms_eps=float(cfg.rms_norm_eps),
        tie_embeddings=True,  # Gemma always ties
        dtype=dtype,
        use_flash=use_flash,
        quantized=quantize,
        quantized_kv=quantize_kv,
        embed_scale=True,
        mlp_act="gelu_tanh",
    )

    hf = hf_model.model
    wd = dtype if dtype != jnp.float32 else np.float32

    def _norm(w):  # Gemma RMSNorm: x_hat * (1 + w) -> flax scale = 1 + w
        return _vec(w) + 1.0

    p: Dict = {
        "embed": {"embedding": _vec(hf.embed_tokens.weight, wd)},
        "norm_f": {"scale": _norm(hf.norm.weight)},
    }
    for i, layer in enumerate(hf.layers):
        p[f"block_{i}"] = {
            "input_norm": {"scale": _norm(layer.input_layernorm.weight)},
            "post_attn_norm": {
                "scale": _norm(layer.post_attention_layernorm.weight)
            },
            "q": {"kernel": _t(layer.self_attn.q_proj.weight, wd)},
            "k": {"kernel": _t(layer.self_attn.k_proj.weight, wd)},
            "v": {"kernel": _t(layer.self_attn.v_proj.weight, wd)},
            "o": {"kernel": _t(layer.self_attn.o_proj.weight, wd)},
            "gate": {"kernel": _t(layer.mlp.gate_proj.weight, wd)},
            "up": {"kernel": _t(layer.mlp.up_proj.weight, wd)},
            "down": {"kernel": _t(layer.mlp.down_proj.weight, wd)},
        }
    params = {"params": p}
    if quantize:
        params = quantize_llama_params(params)
    return model, params


def convert_hf_mixtral(hf_model, max_len: Optional[int] = None,
                       dtype=jnp.float32, use_flash: bool = False,
                       quantize: bool = False, quantize_kv: bool = False):
    """Map a ``transformers.MixtralForCausalLM`` onto (LlamaLM, params).

    Mixtral is the Mistral attention stack with every MLP replaced by a
    sparse MoE block (modeling_mixtral.py::MixtralSparseMoeBlock): a
    bias-free router over ``num_local_experts`` SwiGLU experts, top-
    ``num_experts_per_tok`` routing with the softmax taken in f32 over all
    experts and the selected weights renormalized. Expert weights are
    stacked into (E, d, h)/(E, h, d) tensors so the forward is three batched
    einsums (see ``_LlamaBlock._moe_ffn``). Logits parity vs the torch
    forward is pinned by tests/test_llama.py::TestMixtralFamily.

    ``quantize=True`` stores the attention projections, lm_head, AND the
    stacked expert tensors int8 (per-(expert, out-channel) scales — the
    QDense recipe on the (E, in, out) layout; the router stays full
    precision, routing is tiny and precision-sensitive); ``quantize_kv``
    adds the int8 KV cache.
    """
    cfg = hf_model.config
    if getattr(cfg, "hidden_act", "silu") != "silu":
        raise NotImplementedError(f"Mixtral hidden_act {cfg.hidden_act!r}")
    window = int(cfg.sliding_window) if getattr(
        cfg, "sliding_window", None
    ) else None
    if window is not None and use_flash:
        raise NotImplementedError(
            "use_flash with sliding-window attention (the flash kernel is "
            "plain-causal); convert with use_flash=False"
        )
    model = LlamaLM(
        vocab_size=cfg.vocab_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        d_model=cfg.hidden_size,
        hidden_dim=cfg.intermediate_size,
        max_len=max_len or cfg.max_position_embeddings,
        head_dim=getattr(cfg, "head_dim", None)
        or cfg.hidden_size // cfg.num_attention_heads,
        rope_theta=float(getattr(cfg, "rope_theta", 1e6)),
        rms_eps=float(cfg.rms_norm_eps),
        tie_embeddings=bool(cfg.tie_word_embeddings),
        dtype=dtype,
        use_flash=use_flash,
        quantized=quantize,
        quantized_kv=quantize_kv,
        sliding_window=window,
        num_experts=int(cfg.num_local_experts),
        num_experts_per_tok=int(cfg.num_experts_per_tok),
    )

    hf = hf_model.model
    wd = dtype if dtype != jnp.float32 else np.float32
    p: Dict = {
        "embed": {"embedding": _vec(hf.embed_tokens.weight, wd)},
        "norm_f": {"scale": _vec(hf.norm.weight)},
    }
    for i, layer in enumerate(hf.layers):
        moe = layer.block_sparse_moe
        stack = lambda ws: np.stack([_t(w, wd) for w in ws])
        p[f"block_{i}"] = {
            "input_norm": {"scale": _vec(layer.input_layernorm.weight)},
            "post_attn_norm": {
                "scale": _vec(layer.post_attention_layernorm.weight)
            },
            "q": {"kernel": _t(layer.self_attn.q_proj.weight, wd)},
            "k": {"kernel": _t(layer.self_attn.k_proj.weight, wd)},
            "v": {"kernel": _t(layer.self_attn.v_proj.weight, wd)},
            "o": {"kernel": _t(layer.self_attn.o_proj.weight, wd)},
            "router": {"kernel": _t(moe.gate.weight, wd)},
            "w_gate": stack([ex.w1.weight for ex in moe.experts]),
            "w_up": stack([ex.w3.weight for ex in moe.experts]),
            "w_down": stack([ex.w2.weight for ex in moe.experts]),
        }
    if not model.tie_embeddings:
        p["lm_head"] = {"kernel": _t(hf_model.lm_head.weight, wd)}
    params = {"params": p}
    if quantize:
        params = quantize_llama_params(params)
    return model, params


def fuse_quantized_llama_params(params):
    """Fuse a ``quantize_llama_params`` tree's per-projection q/k/v and
    gate/up entries into single "qkv"/"gateup" entries for
    ``LlamaLM(quantized=True, fused_qkv=True)``.

    The fusion MUST happen in the stored parameters: concatenating
    per-projection kernels inside the forward looks free but XLA
    materializes the concat inside the decode while-body on every step
    (verified on the optimized HLO), re-reading the weight bytes the
    fusion was meant to save. Column order is q|k|v and gate|up (the
    split order in ``_LlamaBlock``). o/down/lm_head stay single. The
    transform is pure concatenation — no requantization; logits match the
    unfused model up to matmul reduction-order noise (the wider fused dot
    accumulates in a different order; test-pinned at rtol 2e-3).
    """

    def cat(subs, field):
        return jnp.concatenate([s[field] for s in subs],
                               axis=subs[0][field].ndim - 1)

    out = {}
    for name, sub in params["params"].items():
        if not name.startswith("block_") or "q" not in sub:
            out[name] = sub
            continue
        blk = dict(sub)
        q, k, v = blk.pop("q"), blk.pop("k"), blk.pop("v")
        qkv = {"kernel_q": cat([q, k, v], "kernel_q"),
               "scale": cat([q, k, v], "scale")}
        if "bias" in q:
            qkv["bias"] = cat([q, k, v], "bias")
        blk["qkv"] = qkv
        if "gate" in blk:
            g, u = blk.pop("gate"), blk.pop("up")
            blk["gateup"] = {"kernel_q": cat([g, u], "kernel_q"),
                             "scale": cat([g, u], "scale")}
        out[name] = blk
    return {"params": out}


_QUANT_KERNELS = {"q", "k", "v", "o", "gate", "up", "down", "lm_head"}
_EXPERT_STACKS = {"w_gate", "w_up", "w_down"}  # Mixtral (E, in, out) tensors


def quantize_llama_params(params, on_device: bool = False):
    """Symmetric per-output-channel int8 quantization of LlamaLM projection
    kernels: scale = max|w| / 127 per column, kernel_q = round(w / scale).

    Returns a params pytree for ``LlamaLM(quantized=True)`` (same config
    otherwise). Embeddings and RMSNorm scales stay full precision. Weight
    bytes drop 4x vs f32 / 2x vs bf16 — decode is weight-bound, so this is
    HBM bandwidth, not just footprint.

    ``on_device=True`` runs the quantization as ONE jitted program on the
    params' current device — required for multi-GB models behind the
    tunneled TPU, where the default host path would round-trip every
    kernel through numpy.
    """

    def q_host(w):
        w = np.asarray(w, dtype=np.float32)
        scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
        q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
        return q, scale.astype(np.float32)

    def q_dev(w):
        w = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.abs(w).max(axis=0), 1e-12) / 127.0
        q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
        return q, scale

    def q3_host(w):
        # (E, in, out) expert stack: one scale per (expert, out-channel)
        w = np.asarray(w, dtype=np.float32)
        scale = np.maximum(np.abs(w).max(axis=1), 1e-12) / 127.0  # (E, out)
        q = np.clip(np.round(w / scale[:, None, :]), -127, 127).astype(np.int8)
        return q, scale.astype(np.float32)

    def q3_dev(w):
        w = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.abs(w).max(axis=1), 1e-12) / 127.0
        q = jnp.clip(
            jnp.round(w / scale[:, None, :]), -127, 127
        ).astype(jnp.int8)
        return q, scale

    def quantize_subtree(tree, qfn, q3fn):
        out = {}
        for name, sub in tree.items():
            if name in _QUANT_KERNELS and isinstance(sub, dict) and "kernel" in sub:
                kernel_q, scale = qfn(sub["kernel"])
                # non-kernel leaves (q/k/v biases) pass through untouched
                rest = {k: v for k, v in sub.items() if k != "kernel"}
                out[name] = {"kernel_q": kernel_q, "scale": scale, **rest}
            elif name in _EXPERT_STACKS and not isinstance(sub, dict):
                q, scale = q3fn(sub)
                out[name + "_q"] = q
                out[name + "_scale"] = scale
            elif isinstance(sub, dict):
                out[name] = quantize_subtree(sub, qfn, q3fn)
            else:
                out[name] = sub
        return out

    if on_device:
        quantize = jax.jit(lambda p: quantize_subtree(p, q_dev, q3_dev))
        return {"params": quantize(params["params"])}
    return {"params": quantize_subtree(params["params"], q_host, q3_host)}
