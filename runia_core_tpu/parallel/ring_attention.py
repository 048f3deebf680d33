"""Ring attention: sequence-parallel exact attention over a device mesh.

The reference's LLM uncertainty path (reference llm_uncertainty/
uncertainty_estimator.py:1-80) runs single-device torch attention, which caps
context length at one device's HBM. This module removes that cap the TPU way:
shard the sequence axis across the mesh, keep each device's Q block resident,
and rotate K/V blocks around the ICI ring with ``lax.ppermute`` while
accumulating a numerically-stable online softmax (flash-attention style
running max / running sum). The result is *exact* attention — identical to
dense softmax attention up to float error — with O(L/n) activation memory per
device and compute/communication overlap handled by XLA.

Use it for long-context uncertainty scoring (eigen/semantic entropy over long
generations) or long-context training; for short sequences plain attention is
faster (the ring has ``n`` sequential steps).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["ring_attention", "ring_self_attention"]

_NEG = -0.5 * jnp.finfo(jnp.float32).max  # finite mask fill; keeps exp() sane


def _ring_attention_local(q, k, v, *, axis_name: str, causal: bool):
    """Per-shard body: q is resident, (k, v) rotate around the ring.

    Shapes (local): q (B, H, Lq, D); k, v (B, H, Lk, D). Online softmax state
    per query row: running max ``m``, running denominator ``l``, running
    numerator ``o``. Fully-masked blocks contribute exactly zero because the
    probability tile is multiplied by the boolean mask after the exp.
    """
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    q32 = q.astype(jnp.float32)
    q_pos = my_idx * lq + jnp.arange(lq)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, ring_step):
        k_blk, v_blk, m, l, o = carry
        # After ``ring_step`` rotations the block we hold originated at
        # shard (my_idx - ring_step) mod n — that fixes its global positions.
        src = (my_idx - ring_step) % n
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q32, k_blk.astype(jnp.float32)
        ) * scale
        if causal:
            k_pos = src * lk + jnp.arange(lk)
            mask = q_pos[:, None] >= k_pos[None, :]
            s = jnp.where(mask, s, _NEG)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        if causal:
            p = p * mask.astype(p.dtype)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32)
        )
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m_new, l, o), None

    init = (
        k,
        v,
        jnp.full((b, h, lq), _NEG, jnp.float32),
        jnp.zeros((b, h, lq), jnp.float32),
        jnp.zeros((b, h, lq, d), jnp.float32),
    )
    (_, _, _, l, o), _ = jax.lax.scan(step, init, jnp.arange(n))
    out = o / jnp.maximum(l, jnp.finfo(jnp.float32).tiny)[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "data",
    causal: bool = True,
) -> jnp.ndarray:
    """Exact attention with the sequence dimension sharded over ``seq_axis``.

    Args:
        q, k, v: (batch, heads, seq, head_dim); ``seq`` must divide evenly by
            the mesh axis size. Inputs need not be pre-sharded — shard_map
            partitions them per the specs.
        mesh: device mesh containing ``seq_axis``.
        seq_axis: mesh axis name the sequence is split over.
        causal: apply a causal mask using *global* positions (correct across
            shard boundaries).

    Returns:
        (batch, heads, seq, head_dim) attention output, sharded like q.
    """
    spec = P(None, None, seq_axis, None)
    fn = shard_map(
        partial(_ring_attention_local, axis_name=seq_axis, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def ring_self_attention(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wo: jnp.ndarray,
    mesh: Mesh,
    num_heads: int,
    seq_axis: str = "data",
    causal: bool = True,
) -> jnp.ndarray:
    """A full self-attention layer on a sequence-sharded residual stream.

    ``x`` is (batch, seq, model); the QKV/output projections run shard-local
    (they are position-wise, so sequence sharding costs no communication) and
    only the attention core pays the ring. This is the building block for
    long-context sequence parallelism in a transformer stack.
    """
    b, s, dm = x.shape
    dh = dm // num_heads

    def to_heads(t):
        return t.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = (to_heads(x @ w) for w in (wq, wk, wv))
    o = ring_attention(q, k, v, mesh, seq_axis=seq_axis, causal=causal)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, dm)
    return o @ wo
