"""Tensor-parallel sharding for LlamaLM over a device mesh.

Megatron-style partitioning expressed purely as parameter shardings — XLA
inserts the collectives (scaling-book recipe: pick a mesh, annotate, let the
partitioner work):

  - q/k/v and gate/up kernels column-sharded over the ``model`` axis
    (head- / hidden-parallel);
  - o and down kernels row-sharded (their matmul contracts the sharded dim,
    so XLA emits one all-reduce per block — the two Megatron f/g points);
  - lm_head column-sharded over vocab;
  - embedding table vocab-sharded (Megatron; XLA partitions the lookup);
  - RMSNorm scales and QDense per-channel scales of row-sharded layers
    replicated.

Serving keeps the KV cache sharded over heads automatically: the cache
entries inherit the k/v projection output sharding through
``jax.lax.dynamic_update_slice`` propagation.

The reference has no model parallelism of any kind (SURVEY.md §2.4); this is
capability the TPU rebuild adds so Llama-class checkpoints larger than one
chip's HBM serve over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["llama_tp_specs", "shard_llama_params"]

_COLUMN = {"q", "k", "v", "gate", "up", "lm_head"}  # kernel (in, out): shard out
_ROW = {"o", "down"}  # kernel (in, out): shard in (contraction -> all-reduce)


def llama_tp_specs(params, axis: str = "model"):
    """PartitionSpec pytree matching a LlamaLM params pytree."""

    def spec(path, leaf):
        names = tuple(getattr(p, "key", None) for p in path)
        parent = names[-2] if len(names) >= 2 else None
        leaf_name = names[-1]
        # int8-quantized layers (models.llama.QDense): kernel_q shards like
        # kernel; the per-output-channel scale follows the output dim.
        if leaf_name in ("kernel", "kernel_q") and parent in _COLUMN:
            return P(None, axis)
        if leaf_name in ("kernel", "kernel_q") and parent in _ROW:
            return P(axis, None)
        if leaf_name == "scale" and parent in _COLUMN:
            return P(axis)
        # Qwen2-family q/k/v biases follow their column-sharded output dim.
        if leaf_name == "bias" and parent in _COLUMN:
            return P(axis)
        # Mixtral stacked expert tensors (E, d, h)/(E, h, d): hidden dim
        # sharded Megatron-style per expert — w_gate/w_up column-parallel,
        # w_down row-parallel (same f/g all-reduce points as the dense MLP);
        # the router stays replicated (tiny, and every shard needs all
        # gate probabilities).
        if leaf_name in ("w_gate", "w_up", "w_gate_q", "w_up_q"):
            return P(None, None, axis)
        if leaf_name in ("w_down", "w_down_q"):
            return P(None, axis, None)
        # int8 expert scales are per-(expert, out-channel): column-parallel
        # stacks shard the out dim with their kernel; the row-parallel
        # w_down's out dim (d_model) is replicated, so its scale is too.
        if leaf_name in ("w_gate_scale", "w_up_scale"):
            return P(None, axis)
        # Embedding table vocab-sharded (Megatron): large-vocab checkpoints
        # are exactly the ones TP exists to serve; XLA partitions the
        # lookup (and the tied lm_head matmul) across the vocab shards.
        if leaf_name == "embedding" and parent == "embed":
            return P(axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_llama_params(params, mesh: Mesh, axis: str = "model"):
    """Place LlamaLM params on ``mesh`` with tensor-parallel shardings.

    The returned pytree is committed to its shardings, so any jitted
    computation over it (JaxGenerator's prefill/decode included) runs
    tensor-parallel without further annotation.
    """
    specs = llama_tp_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params,
        specs,
    )
