"""Expert parallelism: a mixture-of-experts FFN sharded over the mesh.

The reference has no model parallelism of any kind (SURVEY.md section 2.4);
this module adds the expert dimension the TPU way. Experts are sharded over
an ``expert`` mesh axis and tokens over ``data``; dispatch/combine are
einsums against one-hot capacity assignments (the GShard/Switch formulation —
dense einsums keep the MXU busy and sidestep dynamic shapes), and the only
communication is one ``psum`` of the combined output over the expert axis.

Routing semantics: top-k gating with softmax-renormalized weights over the
selected experts, position-in-expert by cumulative count, tokens past an
expert's capacity dropped (contribute zero — the residual stream carries
them, as in Switch Transformer).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["MoEParams", "init_moe", "moe_ffn", "sharded_moe_ffn"]


class MoEParams(NamedTuple):
    """Gate + per-expert FFN weights. ``w_in``/``w_out`` lead with the
    expert axis so sharding it over the mesh is one PartitionSpec."""

    w_gate: jnp.ndarray  # (D, E)
    w_in: jnp.ndarray    # (E, D, H)
    w_out: jnp.ndarray   # (E, H, D)


def init_moe(
    key: jax.Array, d_model: int, d_hidden: int, num_experts: int
) -> MoEParams:
    kg, ki, ko = jax.random.split(key, 3)
    scale_in = 1.0 / jnp.sqrt(jnp.asarray(d_model, jnp.float32))
    scale_out = 1.0 / jnp.sqrt(jnp.asarray(d_hidden, jnp.float32))
    return MoEParams(
        w_gate=jax.random.normal(kg, (d_model, num_experts)) * scale_in,
        w_in=jax.random.normal(ki, (num_experts, d_model, d_hidden)) * scale_in,
        w_out=jax.random.normal(ko, (num_experts, d_hidden, d_model)) * scale_out,
    )


def _dispatch_combine(gate_logits: jnp.ndarray, capacity: int, top_k: int):
    """Build (T, E, C) dispatch mask and combine weights from gate logits.

    Position-in-expert is the token's rank among tokens routed to that
    expert (token order, as in Switch); rank >= capacity drops the token.
    """
    t, e = gate_logits.shape
    probs = jax.nn.softmax(gate_logits, axis=-1)
    top_p, top_idx = jax.lax.top_k(probs, top_k)  # (T, k)
    # Renormalize over the selected experts.
    top_p = top_p / jnp.maximum(top_p.sum(-1, keepdims=True), 1e-9)

    dispatch = jnp.zeros((t, e, capacity), gate_logits.dtype)
    combine = jnp.zeros((t, e, capacity), gate_logits.dtype)
    # Track how many slots each expert has used as the k choices are placed;
    # k is tiny (1 or 2) so this Python loop just unrolls in the trace.
    used = jnp.zeros((e,), jnp.int32)
    for choice in range(top_k):
        idx = top_idx[:, choice]  # (T,)
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.int32)  # (T, E)
        pos = jnp.cumsum(onehot, axis=0) - 1 + used[None, :]  # rank per expert
        my_pos = jnp.take_along_axis(pos, idx[:, None], axis=1)[:, 0]  # (T,)
        keep = my_pos < capacity
        slot = jax.nn.one_hot(
            jnp.where(keep, my_pos, capacity), capacity + 1, dtype=gate_logits.dtype
        )[:, :capacity]  # (T, C); dropped tokens hit the spill column
        sel = onehot.astype(gate_logits.dtype)[:, :, None] * slot[:, None, :]
        dispatch = dispatch + sel
        combine = combine + sel * top_p[:, choice][:, None, None]
        used = used + onehot.sum(axis=0)
    return dispatch, combine


def moe_ffn(
    params: MoEParams,
    x: jnp.ndarray,
    capacity_factor: float = 2.0,
    top_k: int = 1,
) -> jnp.ndarray:
    """Single-device MoE FFN on (T, D) tokens — the sharded version's exact
    reference semantics."""
    t, d = x.shape
    e = params.w_gate.shape[1]
    capacity = max(1, int(capacity_factor * t / e))
    dispatch, combine = _dispatch_combine(x @ params.w_gate, capacity, top_k)
    expert_in = jnp.einsum("td,tec->ecd", x, dispatch)
    hidden = jax.nn.relu(jnp.einsum("ecd,edh->ech", expert_in, params.w_in))
    expert_out = jnp.einsum("ech,ehd->ecd", hidden, params.w_out)
    return jnp.einsum("ecd,tec->td", expert_out, combine)


def sharded_moe_ffn(
    params: MoEParams,
    x: jnp.ndarray,
    mesh: Mesh,
    capacity_factor: float = 2.0,
    top_k: int = 1,
    data_axis: str = "data",
    expert_axis: str = "model",
) -> jnp.ndarray:
    """MoE FFN with tokens sharded over ``data_axis`` and experts over
    ``expert_axis``.

    Each device routes its local tokens to its local experts and produces a
    partial (T_local, D) output; one ``psum`` over the expert axis combines
    the expert contributions. Gating uses the replicated gate matrix, so
    per-token expert choices and weights are identical to the unsharded
    layer. Capacity ranking runs within each data shard (GShard's grouped
    routing: each token group gets ``capacity_factor * group/E`` slots per
    expert), so with no overflow the result is exact vs :func:`moe_ffn`;
    under overflow, *which* tokens drop is decided per group rather than
    globally.
    """
    n_exp = mesh.shape[expert_axis]
    n_data = mesh.shape[data_axis]
    e = params.w_gate.shape[1]
    assert e % n_exp == 0, f"{e} experts not divisible by mesh axis {n_exp}"
    t_local = x.shape[0] // n_data
    capacity = max(1, int(capacity_factor * t_local / e))

    def local(params, x_local):
        my_exp = jax.lax.axis_index(expert_axis)
        e_local = params.w_in.shape[0]
        gate_logits = x_local @ params.w_gate  # full-E logits, global routing
        dispatch, combine = _dispatch_combine(gate_logits, capacity, top_k)
        # Slice this device's expert block out of the global assignment.
        start = my_exp * e_local
        disp_l = jax.lax.dynamic_slice_in_dim(dispatch, start, e_local, axis=1)
        comb_l = jax.lax.dynamic_slice_in_dim(combine, start, e_local, axis=1)
        expert_in = jnp.einsum("td,tec->ecd", x_local, disp_l)
        hidden = jax.nn.relu(jnp.einsum("ecd,edh->ech", expert_in, params.w_in))
        expert_out = jnp.einsum("ech,ehd->ecd", hidden, params.w_out)
        partial_out = jnp.einsum("ecd,tec->td", expert_out, comb_l)
        return jax.lax.psum(partial_out, expert_axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            MoEParams(
                w_gate=P(),
                w_in=P(expert_axis, None, None),
                w_out=P(expert_axis, None, None),
            ),
            P(data_axis, None),
        ),
        out_specs=P(data_axis, None),
        check_vma=False,
    )
    return fn(params, x)
