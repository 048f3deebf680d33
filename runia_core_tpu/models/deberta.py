"""DeBERTa-v2 encoder (disentangled attention) for TPU-native NLI.

The reference's semantic-entropy path lazy-loads
``microsoft/deberta-v2-xxlarge-mnli`` and runs the NLI forwards on its
compute device (reference runia_core/llm_uncertainty/scores.py:429-436,
utils.py:11-43). Until now the rebuild's batched NLI callable wrapped a
*torch* HF model on CPU — the one remaining O(n^2)-forward hot path of
``compute_uncertainties`` that never touched the TPU. This module is the
encoder-family converter that closes it: a flax DeBERTa-v2
sequence-classification model plus ``convert_hf_deberta`` (HF checkpoint ->
(model, params); logits parity vs the torch forward is pinned by
tests/test_deberta.py) and ``wrap_jax_nli`` (a batched
``(premises, hypotheses) -> labels`` callable running ONE padded jitted
forward per bucket on the accelerator — plug it straight into
``semantic_entropy`` / ``compute_uncertainties`` / ``UncertaintyServer``).

Architecture notes (matching HF ``modeling_deberta_v2`` inference
semantics, dropout off):
  - embeddings: word (+ absolute position iff ``position_biased_input``,
    + token-type iff ``type_vocab_size > 0``), optional width projection,
    LayerNorm, zeroed at padded positions;
  - relative positions with the log-bucket map (``make_log_bucket_position``)
    when ``position_buckets > 0``;
  - disentangled attention: content->content plus content->position and/or
    position->content bias terms, each scaled by
    sqrt(head_dim * scale_factor) with scale_factor = 1 + len(pos_att_type);
    position keys/queries come from the SHARED q/k projections when
    ``share_att_key`` (the xxlarge-mnli layout) else from dedicated ones;
  - optional ConvLayer fused after layer 0 (xxlarge: kernel 3, gelu);
  - ContextPooler (first token -> dense -> act) -> classifier head.

The c2p/p2c gathers are expressed as one-hot matmuls over the 2*att_span
bucket axis — XLA lowers ``take_along_axis`` on TPU to slow scatter/gather
loops, while (T, 2K) x (2K, T) one-hots ride the MXU (att_span is 256 for
the production checkpoint, so the one-hot matmul is small next to the
(T, T, H) attention itself).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["DebertaV2Classifier", "convert_hf_deberta", "wrap_jax_nli"]


def _log_bucket_position(rel_pos: jnp.ndarray, bucket_size: int,
                         max_position: int) -> jnp.ndarray:
    """HF ``make_log_bucket_position``: identity inside +-bucket/2, log-
    spaced buckets out to max_position beyond it. int32 in/out."""
    sign = jnp.sign(rel_pos)
    mid = bucket_size // 2
    abs_pos = jnp.where(
        (rel_pos < mid) & (rel_pos > -mid), mid - 1, jnp.abs(rel_pos)
    ).astype(jnp.float32)
    log_pos = (
        jnp.ceil(
            jnp.log(abs_pos / mid)
            / np.log((max_position - 1) / mid)
            * (mid - 1)
        )
        + mid
    )
    return jnp.where(
        abs_pos <= mid, rel_pos.astype(jnp.float32), log_pos * sign
    ).astype(jnp.int32)


def _relative_position(t: int, bucket_size: int, max_position: int):
    """(t, t) bucketed relative positions rel[i, j] = bucket(i - j)."""
    ids = jnp.arange(t, dtype=jnp.int32)
    rel = ids[:, None] - ids[None, :]
    if bucket_size > 0 and max_position > 0:
        rel = _log_bucket_position(rel, bucket_size, max_position)
    return rel


class _DisentangledAttention(nn.Module):
    num_heads: int
    head_dim: int
    pos_att_type: tuple  # subset of ("c2p", "p2c")
    share_att_key: bool
    att_span: int  # pos_ebd_size: position_buckets or max_relative_positions
    relative_attention: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pair_mask, rel_onehot_c2p, rel_onehot_p2c,
                 rel_embeddings):
        """x: (B, T, D). pair_mask: (B, T, T) bool. rel_onehot_*: (T, T, 2K)
        one-hot bucket selectors (None when unused). rel_embeddings:
        (2K, D) post-norm relative-position table."""
        b, t, _ = x.shape
        all_head = self.num_heads * self.head_dim
        q_proj = nn.Dense(all_head, dtype=self.dtype, name="query_proj")
        k_proj = nn.Dense(all_head, dtype=self.dtype, name="key_proj")
        v_proj = nn.Dense(all_head, dtype=self.dtype, name="value_proj")

        def heads(y):  # (..., T, all) -> (..., H, T, hd)
            return jnp.moveaxis(
                y.reshape(*y.shape[:-1], self.num_heads, self.head_dim),
                -3, -2,
            )

        q = heads(q_proj(x))  # (B, H, T, hd)
        k = heads(k_proj(x))
        v = heads(v_proj(x))

        scale_factor = 1 + len(self.pos_att_type)
        scale = float(np.sqrt(self.head_dim * scale_factor))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k / scale)

        if self.relative_attention and self.pos_att_type:
            span = self.att_span
            if self.share_att_key:
                pos_key = heads(k_proj(rel_embeddings))  # (H, 2K, hd)
                pos_query = heads(q_proj(rel_embeddings))
            else:
                if "c2p" in self.pos_att_type:
                    pos_key = heads(
                        nn.Dense(all_head, dtype=self.dtype,
                                 name="pos_key_proj")(rel_embeddings)
                    )
                if "p2c" in self.pos_att_type:
                    pos_query = heads(
                        nn.Dense(all_head, dtype=self.dtype,
                                 name="pos_query_proj")(rel_embeddings)
                    )
            if "c2p" in self.pos_att_type:
                # q . pos_key at bucket(q - k): (B,H,T,2K) selected by the
                # (T,T,2K) one-hot — a matmul, not a gather (see module doc).
                c2p = jnp.einsum("bhqd,hkd->bhqk", q, pos_key)
                scores = scores + jnp.einsum(
                    "bhqc,qkc->bhqk", c2p, rel_onehot_c2p
                ) / scale
            if "p2c" in self.pos_att_type:
                # k . pos_query at bucket(k - q), transposed into (q, k).
                p2c = jnp.einsum("bhkd,hcd->bhkc", k, pos_query)
                scores = scores + jnp.einsum(
                    "bhkc,kqc->bhqk", p2c, rel_onehot_p2c
                ) / scale

        scores = jnp.where(
            pair_mask[:, None, :, :], scores.astype(jnp.float32),
            jnp.finfo(jnp.float32).min,
        )
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bqhd", attn, v).reshape(b, t, all_head)
        return ctx


class DebertaV2Classifier(nn.Module):
    """DeBERTa-v2 for sequence classification (the MNLI entailment shape).

    ``apply(params, input_ids, attention_mask, token_type_ids=None) ->
    (B, num_labels) f32 logits``. Inference-only (dropout omitted).
    """

    vocab_size: int
    num_labels: int = 3
    num_layers: int = 2
    num_heads: int = 4
    d_model: int = 64
    intermediate_size: int = 128
    max_position_embeddings: int = 512
    embedding_size: Optional[int] = None  # != d_model adds embed_proj
    type_vocab_size: int = 0
    position_biased_input: bool = False
    relative_attention: bool = True
    position_buckets: int = 256
    max_relative_positions: int = -1  # <1 -> max_position_embeddings
    norm_rel_ebd: str = "layer_norm"  # "none" skips the rel-table norm
    share_att_key: bool = True
    pos_att_type: tuple = ("p2c", "c2p")
    conv_kernel_size: int = 0  # >0 adds the post-layer-0 ConvLayer
    conv_groups: int = 1
    conv_act: str = "gelu"
    hidden_act: str = "gelu"
    pooler_hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-7
    dtype: jnp.dtype = jnp.float32

    def _act(self, name):
        # HF "gelu" is the EXACT erf form (torch F.gelu default); flax
        # nn.gelu defaults to the tanh approximation — ~4e-4 per call,
        # visibly compounding over 48 layers. Only "gelu_new" is tanh.
        return {"gelu": lambda x: jax.nn.gelu(x, approximate=False),
                "tanh": jnp.tanh, "relu": nn.relu,
                "gelu_new": lambda x: jax.nn.gelu(x, approximate=True)}[name]

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        b, t = input_ids.shape
        mask = attention_mask.astype(bool)
        d = self.d_model
        emb_size = self.embedding_size or d
        ln = lambda name: nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=jnp.float32, name=name
        )

        x = nn.Embed(self.vocab_size, emb_size, dtype=self.dtype,
                     name="word_embeddings")(input_ids)
        if self.position_biased_input:
            pos_ids = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
            x = x + nn.Embed(
                self.max_position_embeddings, emb_size, dtype=self.dtype,
                name="position_embeddings",
            )(pos_ids)
        if self.type_vocab_size > 0:
            tt = (token_type_ids if token_type_ids is not None
                  else jnp.zeros((b, t), jnp.int32))
            x = x + nn.Embed(self.type_vocab_size, emb_size,
                             dtype=self.dtype,
                             name="token_type_embeddings")(tt)
        if emb_size != d:
            x = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name="embed_proj")(x)
        x = ln("emb_LayerNorm")(x.astype(jnp.float32)).astype(self.dtype)
        x = x * mask[:, :, None].astype(x.dtype)
        embeddings = x

        # Shared relative-position machinery (computed once, used by every
        # layer): bucketed (T, T) positions, their one-hot selectors, and
        # the (optionally LayerNormed) (2K, D) relative embedding table.
        rel_onehot_c2p = rel_onehot_p2c = rel_embeddings = None
        if self.relative_attention:
            max_rel = (self.max_relative_positions
                       if self.max_relative_positions >= 1
                       else self.max_position_embeddings)
            span = (self.position_buckets if self.position_buckets > 0
                    else max_rel)
            rel_pos = _relative_position(t, self.position_buckets, max_rel)
            c2p_pos = jnp.clip(rel_pos + span, 0, 2 * span - 1)
            p2c_pos = jnp.clip(-rel_pos + span, 0, 2 * span - 1)
            if "c2p" in self.pos_att_type:
                rel_onehot_c2p = jax.nn.one_hot(
                    c2p_pos, 2 * span, dtype=self.dtype
                )
            if "p2c" in self.pos_att_type:
                rel_onehot_p2c = jax.nn.one_hot(
                    p2c_pos, 2 * span, dtype=self.dtype
                )
            table = self.param(
                "rel_embeddings", nn.initializers.normal(0.02),
                (2 * span, d), jnp.float32,
            )
            if "layer_norm" in self.norm_rel_ebd:
                rel_embeddings = ln("rel_LayerNorm")(table).astype(self.dtype)
            else:
                rel_embeddings = table.astype(self.dtype)

        pair_mask = mask[:, :, None] & mask[:, None, :]
        span_arg = (self.position_buckets if self.position_buckets > 0 else
                    (self.max_relative_positions
                     if self.max_relative_positions >= 1
                     else self.max_position_embeddings))
        for i in range(self.num_layers):
            ctx = _DisentangledAttention(
                self.num_heads, d // self.num_heads, self.pos_att_type,
                self.share_att_key, span_arg, self.relative_attention,
                self.dtype, name=f"layer_{i}_attn",
            )(x, pair_mask, rel_onehot_c2p, rel_onehot_p2c, rel_embeddings)
            attn_out = nn.Dense(d, dtype=self.dtype,
                                name=f"layer_{i}_attn_out")(ctx)
            x = ln(f"layer_{i}_attn_ln")(
                (attn_out + x).astype(jnp.float32)
            ).astype(self.dtype)
            if i == 0 and self.conv_kernel_size > 0:
                # ConvLayer: conv over the EMBEDDING output, zeroed at pads,
                # activated, residual-added to layer 0's output, normed,
                # re-masked (HF ConvLayer.forward semantics).
                conv = nn.Conv(
                    d, kernel_size=(self.conv_kernel_size,),
                    padding=[( (self.conv_kernel_size - 1) // 2,) * 2],
                    feature_group_count=self.conv_groups,
                    dtype=self.dtype, name="conv",
                )(embeddings)
                conv = jnp.where(mask[:, :, None], conv, 0.0)
                conv = self._act(self.conv_act)(conv)
                x = ln("conv_ln")(
                    (x + conv).astype(jnp.float32)
                ).astype(self.dtype)
                x = x * mask[:, :, None].astype(x.dtype)
            h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                         name=f"layer_{i}_ffn_in")(x)
            h = self._act(self.hidden_act)(h)
            h = nn.Dense(d, dtype=self.dtype, name=f"layer_{i}_ffn_out")(h)
            x = ln(f"layer_{i}_ffn_ln")(
                (h + x).astype(jnp.float32)
            ).astype(self.dtype)

        pooled = nn.Dense(d, dtype=self.dtype, name="pooler")(x[:, 0])
        pooled = self._act(self.pooler_hidden_act)(pooled)
        logits = nn.Dense(self.num_labels, dtype=self.dtype,
                          name="classifier")(pooled)
        return logits.astype(jnp.float32)


def _t(w, dtype=np.float32):
    return np.asarray(w.detach().cpu().float().numpy().T).astype(dtype)


def _vec(w, dtype=np.float32):
    return np.asarray(w.detach().cpu().float().numpy()).astype(dtype)


def _dense(linear, dtype):
    p = {"kernel": _t(linear.weight, dtype)}
    if linear.bias is not None:
        p["bias"] = _vec(linear.bias)
    return p


def _lnp(torch_ln):
    return {"scale": _vec(torch_ln.weight), "bias": _vec(torch_ln.bias)}


def convert_hf_deberta(hf_model, dtype=jnp.float32):
    """Map a ``transformers.DebertaV2ForSequenceClassification`` onto
    (DebertaV2Classifier, params). Logits parity vs the torch forward is
    pinned by tests/test_deberta.py; the production target is
    ``microsoft/deberta-v2-xxlarge-mnli`` (48L, d=1536, buckets 256,
    share_att_key, conv_kernel_size 3 — reference llm_uncertainty/
    scores.py:429-436 loads it for semantic entropy)."""
    cfg = hf_model.config
    pos_att = tuple(cfg.pos_att_type or ())
    model = DebertaV2Classifier(
        vocab_size=cfg.vocab_size,
        num_labels=int(getattr(cfg, "num_labels", 2)),
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        d_model=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        embedding_size=getattr(cfg, "embedding_size", None),
        type_vocab_size=int(cfg.type_vocab_size),
        position_biased_input=bool(
            getattr(cfg, "position_biased_input", True)
        ),
        relative_attention=bool(getattr(cfg, "relative_attention", False)),
        position_buckets=int(getattr(cfg, "position_buckets", -1)),
        max_relative_positions=int(
            getattr(cfg, "max_relative_positions", -1)
        ),
        norm_rel_ebd=str(getattr(cfg, "norm_rel_ebd", "none")).lower(),
        share_att_key=bool(getattr(cfg, "share_att_key", False)),
        pos_att_type=pos_att,
        conv_kernel_size=int(getattr(cfg, "conv_kernel_size", 0)),
        conv_groups=int(getattr(cfg, "conv_groups", 1)),
        conv_act=str(getattr(cfg, "conv_act", "tanh")),
        hidden_act=str(cfg.hidden_act),
        pooler_hidden_act=str(getattr(cfg, "pooler_hidden_act", "gelu")),
        layer_norm_eps=float(cfg.layer_norm_eps),
        dtype=dtype,
    )

    wd = dtype if dtype != jnp.float32 else np.float32
    emb = hf_model.deberta.embeddings
    enc = hf_model.deberta.encoder
    p: Dict = {
        "word_embeddings": {
            "embedding": _vec(emb.word_embeddings.weight, wd)
        },
        "emb_LayerNorm": _lnp(emb.LayerNorm),
        "pooler": _dense(hf_model.pooler.dense, wd),
        "classifier": _dense(hf_model.classifier, wd),
    }
    if model.position_biased_input:
        p["position_embeddings"] = {
            "embedding": _vec(emb.position_embeddings.weight, wd)
        }
    if model.type_vocab_size > 0:
        p["token_type_embeddings"] = {
            "embedding": _vec(emb.token_type_embeddings.weight, wd)
        }
    if emb.embed_proj is not None:
        p["embed_proj"] = {"kernel": _t(emb.embed_proj.weight, wd)}
    if model.relative_attention:
        p["rel_embeddings"] = _vec(enc.rel_embeddings.weight)
        if "layer_norm" in model.norm_rel_ebd:
            p["rel_LayerNorm"] = _lnp(enc.LayerNorm)
    if model.conv_kernel_size > 0:
        # torch Conv1d weight (out, in/groups, K) -> flax (K, in/groups, out)
        p["conv"] = {
            "kernel": np.asarray(
                enc.conv.conv.weight.detach().cpu().float().numpy()
            ).transpose(2, 1, 0).astype(wd),
            "bias": _vec(enc.conv.conv.bias),
        }
        p["conv_ln"] = _lnp(enc.conv.LayerNorm)
    for i, layer in enumerate(enc.layer):
        att = layer.attention.self
        p[f"layer_{i}_attn"] = {
            "query_proj": _dense(att.query_proj, wd),
            "key_proj": _dense(att.key_proj, wd),
            "value_proj": _dense(att.value_proj, wd),
        }
        if model.relative_attention and not model.share_att_key:
            if "c2p" in pos_att:
                p[f"layer_{i}_attn"]["pos_key_proj"] = _dense(
                    att.pos_key_proj, wd
                )
            if "p2c" in pos_att:
                p[f"layer_{i}_attn"]["pos_query_proj"] = _dense(
                    att.pos_query_proj, wd
                )
        p[f"layer_{i}_attn_out"] = _dense(layer.attention.output.dense, wd)
        p[f"layer_{i}_attn_ln"] = _lnp(layer.attention.output.LayerNorm)
        p[f"layer_{i}_ffn_in"] = _dense(layer.intermediate.dense, wd)
        p[f"layer_{i}_ffn_out"] = _dense(layer.output.dense, wd)
        p[f"layer_{i}_ffn_ln"] = _lnp(layer.output.LayerNorm)
    return model, {"params": p}


def wrap_jax_nli(
    model: DebertaV2Classifier,
    params,
    tokenizer,
    max_len: int = 256,
    len_buckets: Sequence[int] = (32, 64, 128, 256),
    batch_bucket: int = 16,
) -> Callable[..., np.ndarray]:
    """Batched NLI label callable running on the JAX backend.

    Drop-in for ``llm.utils.make_nli_batch_labels`` (the torch path):
    ``(premises, hypotheses) -> (n,) argmax labels`` — but the padded
    forward is ONE jitted DeBERTa call on the accelerator. Sequence
    lengths and batch size are bucketed so steady-state traffic reuses a
    handful of compiled shapes (each new shape costs a 30-60 s compile
    over a tunneled TPU).

    ``tokenizer`` is an HF tokenizer (host-side tokenization only — no
    torch in the loop). Pairs longer than ``max_len`` tokens are truncated
    with the tokenizer's ``longest_first`` strategy, matching the torch
    wrapper's ``truncation=True``.
    """
    buckets = sorted(set(int(b) for b in len_buckets) | {int(max_len)})

    # params ride as an ARGUMENT: a jit closing over the (multi-GB) tree
    # captures it as lowering constants — 3+ GB baked into the program and
    # a far slower compile (observed on the xxlarge-mnli geometry).
    jit_forward = jax.jit(
        lambda p, ids, mask, type_ids: model.apply(p, ids, mask, type_ids)
    )

    def forward(ids, mask, type_ids):
        return jit_forward(params, ids, mask, type_ids)

    def batch_labels(premises, hypotheses) -> np.ndarray:
        enc = tokenizer(
            list(premises), list(hypotheses),
            padding=True, truncation=True, max_length=max_len,
            return_tensors="np",
        )
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        type_ids = np.asarray(
            enc.get("token_type_ids", np.zeros_like(ids)), np.int32
        )
        n, t = ids.shape
        t_pad = next((b for b in buckets if b >= t), int(max_len))
        n_pad = -(-max(n, 1) // batch_bucket) * batch_bucket
        full_ids = np.zeros((n_pad, t_pad), np.int32)
        full_mask = np.zeros((n_pad, t_pad), np.int32)
        full_type = np.zeros((n_pad, t_pad), np.int32)
        full_ids[:n, :t] = ids[:, :t_pad]
        full_mask[:n, :t] = mask[:, :t_pad]
        full_type[:n, :t] = type_ids[:, :t_pad]
        # Padded rows need one valid token: an all-masked row would softmax
        # over an all -inf row (nan) — point it at position 0.
        full_mask[n:, 0] = 1
        logits = np.asarray(forward(full_ids, full_mask, full_type))
        return np.argmax(logits[:n], axis=1)

    # Marker consumed by llm.scores.semantic_entropy: route this callable
    # through the batched clustering path (tokenizer=None there).
    batch_labels.is_batch_labels = True
    return batch_labels
