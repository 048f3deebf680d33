"""GPT-NeoX / Pythia decoder with taps and KV cache.

The Pythia suite (GPT-NeoX architecture) is the standard research family
for LLM uncertainty work, so checkpoints of this layout must run TPU-native
like the Llama and GPT-2 families do (reference consumes them via HF
generate — runia_core/llm_uncertainty/scores.py:429-456). Architectural
deltas vs those: fused per-head-interleaved QKV with biases, PARTIAL rotary
embeddings (``rotary_pct`` of each head dim), LayerNorm (with bias) instead
of RMSNorm, exact-erf GELU, and a parallel residual
(``x + attn(ln1(x)) + mlp(ln2(x))``) by default.

Honors the CausalLM forward/cache contract (models/transformer.py), so
``llm.generate.JaxGenerator``, ``init_cache``, and every uncertainty score
work unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from runia_core_tpu.models.llama import _apply_rope, _rope_cos_sin

__all__ = ["NeoXLM", "convert_hf_gpt_neox"]


class _NeoXBlock(nn.Module):
    num_heads: int
    d_model: int
    hidden_dim: int
    ln_eps: float
    rotary_ndims: int
    rope_theta: float
    parallel_residual: bool = True

    @nn.compact
    def __call__(self, x, mask, positions, cache=None, cache_index=None):
        head_dim = self.d_model // self.num_heads
        b, t, _ = x.shape
        h = nn.LayerNorm(epsilon=self.ln_eps, name="input_norm")(x)

        qkv = nn.Dense(3 * self.d_model, name="qkv")(h)
        qkv = qkv.reshape(b, t, self.num_heads, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each (B, T, H, hd)

        # Partial rotary: first rotary_ndims of each head rotate, the tail
        # passes through (Pythia: rotary_pct=0.25).
        cos, sin = _rope_cos_sin(positions, self.rotary_ndims, self.rope_theta)

        def rope(u):
            rot = _apply_rope(u[..., : self.rotary_ndims], cos, sin)
            return jnp.concatenate([rot, u[..., self.rotary_ndims:]], axis=-1)

        q, k = rope(q), rope(k)

        if cache is not None:
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

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_all) / np.sqrt(head_dim)
        logits = jnp.where(mask, logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.where(mask, attn, 0.0)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v_all).reshape(b, t, self.d_model)
        attn_out = nn.Dense(self.d_model, name="attn_out")(out)

        # Parallel residual (Pythia default): both branches read the SAME
        # input x; sequential (use_parallel_residual=False) folds the
        # attention residual in before the MLP's LayerNorm.
        mlp_input = x if self.parallel_residual else x + attn_out
        h2 = nn.LayerNorm(epsilon=self.ln_eps, name="post_attn_norm")(mlp_input)
        mlp = nn.Dense(self.hidden_dim, name="mlp_in")(h2)
        mlp = nn.gelu(mlp, approximate=False)  # HF "gelu" = exact erf
        mlp_out = nn.Dense(self.d_model, name="mlp_out")(mlp)
        if self.parallel_residual:
            x = x + attn_out + mlp_out
        else:
            x = mlp_input + mlp_out
        return x, attn, new_kv


class NeoXLM(nn.Module):
    """GPT-NeoX-family decoder (Pythia). Same call contract as CausalLM."""

    vocab_size: int
    num_layers: int = 2
    num_heads: int = 4
    d_model: int = 64
    hidden_dim: Optional[int] = None  # HF intermediate_size; None = 4*d
    max_len: int = 256
    ln_eps: float = 1e-5
    rotary_pct: float = 0.25
    rope_theta: float = 10000.0
    parallel_residual: bool = True

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        cache: Optional[Dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        token_valid: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
    ):
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
                jnp.arange(kv_len)[None, None, None, :]
                <= q_phys[None, None, :, None]
            )
            if token_valid is not None:
                mask = mask & token_valid[:, None, None, :]

        head_dim = self.d_model // self.num_heads
        rotary_ndims = int(head_dim * self.rotary_pct)

        x = nn.Embed(self.vocab_size, self.d_model, name="embed")(tokens)
        hiddens = [x]
        attns = []
        new_layer_caches = []
        for i in range(self.num_layers):
            layer_cache = cache["layers"][i] if cache is not None else None
            x, attn, new_kv = _NeoXBlock(
                self.num_heads, self.d_model,
                self.hidden_dim or 4 * self.d_model, self.ln_eps, rotary_ndims,
                self.rope_theta, self.parallel_residual, name=f"block_{i}",
            )(x, mask, positions, layer_cache, cache_index)
            hiddens.append(x)
            attns.append(attn)
            if new_kv is not None:
                new_layer_caches.append(new_kv)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="norm_f")(x)
        logits = nn.Dense(self.vocab_size, use_bias=False, name="lm_head")(x)
        new_cache = {"layers": new_layer_caches} if cache is not None else None
        return logits, jnp.stack(attns), jnp.stack(hiddens), new_cache


def convert_hf_gpt_neox(hf_model) -> Tuple[NeoXLM, Dict]:
    """Map a ``transformers.GPTNeoXForCausalLM`` (Pythia) onto (NeoXLM,
    variables).

    The fused ``query_key_value`` weight is stored per-head interleaved —
    each head's rows are [q | k | v] — so the converter de-interleaves into
    the (B, T, H, 3*hd)-split layout NeoXLM computes. Eval-mode logits
    parity vs torch is pinned by tests/test_neox.py.
    """
    cfg = hf_model.config
    if getattr(cfg, "attention_bias", True) is False:
        raise NotImplementedError("GPT-NeoX without attention biases")
    model = NeoXLM(
        vocab_size=cfg.vocab_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        d_model=cfg.hidden_size,
        hidden_dim=cfg.intermediate_size,
        max_len=cfg.max_position_embeddings,
        ln_eps=float(cfg.layer_norm_eps),
        rotary_pct=float(cfg.rotary_pct),
        rope_theta=float(getattr(cfg, "rotary_emb_base", 10000.0)),
        parallel_residual=bool(cfg.use_parallel_residual),
    )

    def _np(w):
        return np.asarray(w.detach().cpu().float().numpy(), np.float32)

    hf = hf_model.gpt_neox
    p: Dict[str, Any] = {
        "embed": {"embedding": _np(hf.embed_in.weight)},
        "norm_f": {
            "scale": _np(hf.final_layer_norm.weight),
            "bias": _np(hf.final_layer_norm.bias),
        },
        "lm_head": {"kernel": _np(hf_model.embed_out.weight).T},
    }
    for i, layer in enumerate(hf.layers):
        att = layer.attention
        # (3d, d) rows ordered head-major [h0: q k v | h1: q k v | ...];
        # NeoXLM's reshape (B,T,H,3hd)+split wants exactly this row order,
        # so the fused kernel transposes straight in.
        p[f"block_{i}"] = {
            "input_norm": {
                "scale": _np(layer.input_layernorm.weight),
                "bias": _np(layer.input_layernorm.bias),
            },
            "post_attn_norm": {
                "scale": _np(layer.post_attention_layernorm.weight),
                "bias": _np(layer.post_attention_layernorm.bias),
            },
            "qkv": {
                "kernel": _np(att.query_key_value.weight).T,
                "bias": _np(att.query_key_value.bias),
            },
            "attn_out": {
                "kernel": _np(att.dense.weight).T,
                "bias": _np(att.dense.bias),
            },
            "mlp_in": {
                "kernel": _np(layer.mlp.dense_h_to_4h.weight).T,
                "bias": _np(layer.mlp.dense_h_to_4h.bias),
            },
            "mlp_out": {
                "kernel": _np(layer.mlp.dense_4h_to_h.weight).T,
                "bias": _np(layer.mlp.dense_4h_to_h.bias),
            },
        }
    return model, {"params": p}
