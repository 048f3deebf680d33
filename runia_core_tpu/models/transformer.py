"""Decoder-only transformer LM with attention/hidden-state taps and KV cache.

The LLM-uncertainty scores need per-step logits, attention maps, and hidden
states (reference runia_core/llm_uncertainty/scores.py:439-456). HF exposes
these via ``output_attentions``/``output_hidden_states``; this flax module is
the TPU-native equivalent: the forward returns (logits, attentions, hiddens),
and a functional KV cache supports single-token decode steps inside
``lax.scan`` (llm/generate.py).

Layout: attentions (L, B, H, T_q, T_kv); hiddens (L+1, B, T, D) with the
embedding output first (HF convention).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CausalLM", "convert_hf_gpt2", "init_cache"]


class Block(nn.Module):
    num_heads: int
    d_model: int
    num_experts: int = 0  # 0 = dense MLP; >0 = MoE FFN (top-2 routing)
    moe_capacity_factor: float = 2.0
    ln_eps: float = 1e-6  # GPT-2 checkpoints use 1e-5 (set via CausalLM)

    @nn.compact
    def __call__(self, x, mask, cache=None, cache_index=None):
        """Pre-LN block. Returns (x, attention (B, H, Tq, Tkv), new_kv)."""
        h = nn.LayerNorm(epsilon=self.ln_eps)(x)
        head_dim = self.d_model // self.num_heads
        b, t, _ = h.shape

        def heads(name):
            proj = nn.Dense(self.d_model, name=name)(h)
            return proj.reshape(b, t, self.num_heads, head_dim)

        q = heads("q")
        k = heads("k")
        v = heads("v")

        if cache is not None:
            # Insert this step's k/v at cache_index; attend over the cache.
            k_cache = jax.lax.dynamic_update_slice(
                cache["k"], k, (0, cache_index, 0, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                cache["v"], v, (0, cache_index, 0, 0)
            )
            k_all, v_all = k_cache, v_cache
            new_kv = {"k": k_cache, "v": v_cache}
        else:
            k_all, v_all = k, v
            new_kv = None

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_all) / jnp.sqrt(head_dim * 1.0)
        logits = jnp.where(mask, logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.where(mask, attn, 0.0)  # keep masked entries exactly zero
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v_all).reshape(b, t, self.d_model)
        x = x + nn.Dense(self.d_model, name="attn_out")(out)

        h2 = nn.LayerNorm(epsilon=self.ln_eps)(x)
        if self.num_experts > 0:
            x = x + self._moe_ffn(h2)
        else:
            mlp = nn.Dense(4 * self.d_model)(h2)
            mlp = nn.gelu(mlp)
            x = x + nn.Dense(self.d_model, name="mlp_out")(mlp)
        return x, attn, new_kv

    def _moe_ffn(self, h):
        """Top-2 mixture-of-experts FFN (routing math shared with
        parallel.moe so the expert-parallel layer is a drop-in)."""
        from runia_core_tpu.parallel.moe import _dispatch_combine

        b, t, d = h.shape
        e, hidden = self.num_experts, 4 * self.d_model
        flat = h.reshape(b * t, d)
        gate_logits = nn.Dense(e, use_bias=False, name="moe_gate")(flat)
        w_in = self.param(
            "moe_w_in", nn.initializers.lecun_normal(), (e, d, hidden)
        )
        w_out = self.param(
            "moe_w_out", nn.initializers.lecun_normal(), (e, hidden, d)
        )
        capacity = max(1, int(self.moe_capacity_factor * flat.shape[0] / e))
        top_k = min(2, e)
        dispatch, combine = _dispatch_combine(gate_logits, capacity, top_k)
        expert_in = jnp.einsum("td,tec->ecd", flat, dispatch)
        act = nn.gelu(jnp.einsum("ecd,edh->ech", expert_in, w_in))
        expert_out = jnp.einsum("ech,ehd->ecd", act, w_out)
        return jnp.einsum("ecd,tec->td", expert_out, combine).reshape(b, t, d)


class CausalLM(nn.Module):
    """Decoder-only LM. ``num_experts > 0`` swaps every block's dense MLP
    for a top-2 MoE FFN; note MoE capacity ranking runs per forward call, so
    prefill and decode agree exactly only in the no-overflow regime — keep
    ``moe_capacity_factor`` generous (>= num_experts guarantees no drops)."""

    vocab_size: int
    num_layers: int = 4
    num_heads: int = 4
    d_model: int = 64
    max_len: int = 256
    num_experts: int = 0
    moe_capacity_factor: float = 2.0
    ln_eps: float = 1e-6
    # GPT-2-style weight tying: logits = embedding^T matmul, no lm_head
    # params (required for converted GPT-2 checkpoints).
    tie_embeddings: bool = False
    # jax.checkpoint each block for training: recompute activations in the
    # backward pass (O(L) less activation HBM, ~1 extra forward of FLOPs).
    # Only applies to the no-cache (training/prefill) path — decode steps
    # carry no activation memory worth saving.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        cache: Optional[Dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        token_valid: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
    ):
        """Forward pass.

        Prefill: ``tokens`` (B, T), cache None -> causal self-attention.
        Decode: ``tokens`` (B, 1) with cache + cache_index -> attends over
        cached keys up to and including this step.

        Batched left-padded prompts: pass ``token_valid`` (B, T) marking real
        prompt tokens; pad slots are excluded from attention (theirs and
        others') and logical positions come from the cumulative valid count
        (override with ``positions`` (B, T) during decode, where each
        sequence's logical position differs).

        Returns:
            logits (B, T, V), attentions (L, B, H, T, T_kv),
            hiddens (L+1, B, T, D), new_cache (or None).
        """
        b, t = tokens.shape
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
            q_phys = cache_index + jnp.arange(t)
            if positions is None:
                positions = jnp.broadcast_to(q_phys[None, :], (b, t))
            mask = (
                jnp.arange(kv_len)[None, None, None, :] <= q_phys[None, None, :, None]
            )
            if token_valid is not None:
                # token_valid marks valid physical KV slots (B, kv_len).
                mask = mask & token_valid[:, None, None, :]

        embed = nn.Embed(self.vocab_size, self.d_model, name="embed")
        x = embed(tokens)
        x = x + nn.Embed(self.max_len, self.d_model, name="pos_embed")(positions)

        hiddens = [x]
        attns = []
        new_layer_caches = []
        block_cls = Block
        if self.remat and cache is None:
            block_cls = nn.remat(Block, static_argnums=())
        for i in range(self.num_layers):
            layer_cache = cache["layers"][i] if cache is not None else None
            x, attn, new_kv = block_cls(
                self.num_heads, self.d_model, self.num_experts,
                self.moe_capacity_factor, self.ln_eps, name=f"block_{i}",
            )(x, mask, layer_cache, cache_index)
            hiddens.append(x)
            attns.append(attn)
            if new_kv is not None:
                new_layer_caches.append(new_kv)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="ln_f")(x)
        if self.tie_embeddings:
            logits = embed.attend(x)
        else:
            logits = nn.Dense(self.vocab_size, name="lm_head")(x)

        new_cache = {"layers": new_layer_caches} if cache is not None else None
        return logits, jnp.stack(attns), jnp.stack(hiddens), new_cache


def init_cache(model, batch: int, max_len: int) -> Dict:
    """Allocate an all-zero KV cache pytree.

    Works for any decoder honoring the CausalLM cache contract; models with
    grouped-query attention declare ``num_kv_heads`` / ``head_dim`` (see
    models/llama.py) — absent attributes fall back to MHA dimensions.
    """
    head_dim = getattr(model, "head_dim", None) or model.d_model // model.num_heads
    kv_heads = getattr(model, "num_kv_heads", None) or model.num_heads
    dtype = getattr(model, "dtype", jnp.float32)
    if getattr(model, "quantized_kv", False):
        # KV8 layout (models/llama.py): int8 values + per-(B, pos, head)
        # f32 scales.
        layer = lambda: {
            "k": jnp.zeros((batch, max_len, kv_heads, head_dim), jnp.int8),
            "v": jnp.zeros((batch, max_len, kv_heads, head_dim), jnp.int8),
            "k_scale": jnp.zeros((batch, max_len, kv_heads), jnp.float32),
            "v_scale": jnp.zeros((batch, max_len, kv_heads), jnp.float32),
        }
    else:
        layer = lambda: {
            "k": jnp.zeros((batch, max_len, kv_heads, head_dim), dtype),
            "v": jnp.zeros((batch, max_len, kv_heads, head_dim), dtype),
        }
    return {"layers": [layer() for _ in range(model.num_layers)]}


def convert_hf_gpt2(hf_model) -> Tuple["CausalLM", Dict]:
    """Convert a ``transformers`` GPT2LMHeadModel to (CausalLM, variables).

    GPT-2 is the pre-LN learned-position architecture CausalLM implements;
    the converter maps wte/wpe, per-block fused c_attn (HF Conv1D stores
    (in, out) — split, no transpose), c_proj, the two LayerNorms, the MLP
    pair, and ln_f, with weight tying for the logits. Eval parity vs torch
    is pinned by tests/test_torch_convert.py. Together with
    ``llama.convert_hf_llama`` this covers both HF causal-LM layout families
    the reference's LLM flow consumes (reference llm_uncertainty/
    scores.py:429-456 drives GPT-2-style checkpoints through HF generate).
    """
    import numpy as np

    cfg = hf_model.config
    # Knobs that change the forward without changing any param shape — such
    # checkpoints would load cleanly and diverge silently, so raise instead
    # (the converter contract in docs/CONVERTERS.md). gelu_new is GPT-2's
    # tanh approximation, which is what CausalLM computes.
    act = getattr(cfg, "activation_function", "gelu_new")
    if act not in ("gelu_new", "gelu_pytorch_tanh"):
        raise NotImplementedError(f"GPT-2 activation_function={act!r}")
    if getattr(cfg, "scale_attn_by_inverse_layer_idx", False):
        raise NotImplementedError("GPT-2 scale_attn_by_inverse_layer_idx=True")
    if getattr(cfg, "reorder_and_upcast_attn", False):
        raise NotImplementedError("GPT-2 reorder_and_upcast_attn=True")
    sd = {k: v for k, v in hf_model.state_dict().items()}

    def _np(t):
        return np.asarray(t.detach().cpu().float().numpy(), np.float32)

    d = cfg.n_embd
    model = CausalLM(
        vocab_size=cfg.vocab_size,
        num_layers=cfg.n_layer,
        num_heads=cfg.n_head,
        d_model=d,
        max_len=cfg.n_positions,
        ln_eps=float(cfg.layer_norm_epsilon),
        tie_embeddings=True,
    )

    params: Dict[str, Any] = {
        "embed": {"embedding": _np(sd["transformer.wte.weight"])},
        "pos_embed": {"embedding": _np(sd["transformer.wpe.weight"])},
        "ln_f": {
            "scale": _np(sd["transformer.ln_f.weight"]),
            "bias": _np(sd["transformer.ln_f.bias"]),
        },
    }
    for i in range(cfg.n_layer):
        pre = f"transformer.h.{i}"
        # HF Conv1D weight is (in, out) == the flax kernel layout.
        w_attn = _np(sd[f"{pre}.attn.c_attn.weight"])  # (d, 3d)
        b_attn = _np(sd[f"{pre}.attn.c_attn.bias"])    # (3d,)
        wq, wk, wv = np.split(w_attn, 3, axis=1)
        bq, bk, bv = np.split(b_attn, 3)
        params[f"block_{i}"] = {
            "LayerNorm_0": {
                "scale": _np(sd[f"{pre}.ln_1.weight"]),
                "bias": _np(sd[f"{pre}.ln_1.bias"]),
            },
            "q": {"kernel": wq, "bias": bq},
            "k": {"kernel": wk, "bias": bk},
            "v": {"kernel": wv, "bias": bv},
            "attn_out": {
                "kernel": _np(sd[f"{pre}.attn.c_proj.weight"]),
                "bias": _np(sd[f"{pre}.attn.c_proj.bias"]),
            },
            "LayerNorm_1": {
                "scale": _np(sd[f"{pre}.ln_2.weight"]),
                "bias": _np(sd[f"{pre}.ln_2.bias"]),
            },
            "Dense_0": {
                "kernel": _np(sd[f"{pre}.mlp.c_fc.weight"]),
                "bias": _np(sd[f"{pre}.mlp.c_fc.bias"]),
            },
            "mlp_out": {
                "kernel": _np(sd[f"{pre}.mlp.c_proj.weight"]),
                "bias": _np(sd[f"{pre}.mlp.c_proj.bias"]),
            },
        }
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    return model, variables
