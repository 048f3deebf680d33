"""Pipeline parallelism: GPipe-style stage execution over a mesh axis.

The reference has no pipeline parallelism (SURVEY.md section 2.4). Here a
stack of identically-shaped blocks (the transformer/ResNet regime) is run
with its layers sharded over a ``stage`` mesh axis: stage ``s`` holds block
``s``'s params, microbatches enter stage 0 one per step, and activations hop
stage-to-stage on the ICI ring via ``lax.ppermute``. One ``lax.scan`` drives
the whole schedule — M + S - 1 steps for M microbatches on S stages, each
step running every stage in parallel on a different microbatch (the classic
GPipe pipelining diagram, with bubble fraction (S-1)/(M+S-1)).

Autodiff works through the scan + ppermute, so ``jax.grad`` of a pipelined
forward is the pipelined backward — no hand-written schedule.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_apply"]


def pipeline_apply(
    block_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
    stage_axis: str = "model",
) -> jnp.ndarray:
    """Apply ``num_stages`` blocks to ``x`` with blocks sharded over
    ``stage_axis``.

    Args:
        block_fn: ``(params_one_block, activation) -> activation``; the
            per-stage compute. Activation shape must be preserved (residual
            blocks, transformer layers).
        stacked_params: pytree whose leaves lead with the stage axis
            (S, ...) — e.g. from ``jax.vmap(init)`` over S keys. Sharded so
            each device holds one stage's slice.
        x: (B, ...) batch; B must divide by ``num_microbatches`` and the
            microbatch flow works for any S >= 1 dividing the mesh axis.
        num_microbatches: GPipe M. Larger M shrinks the pipeline bubble
            ((S-1)/(M+S-1)) at constant memory per stage.

    Returns:
        (B, ...) output, numerically identical to applying the S blocks
        sequentially to the full batch.
    """
    n_stages = mesh.shape[stage_axis]
    b = x.shape[0]
    assert b % num_microbatches == 0, (
        f"batch {b} not divisible by {num_microbatches} microbatches"
    )
    mb = b // num_microbatches
    m = num_microbatches
    steps = m + n_stages - 1
    fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def local(params, x_all):
        # params: this stage's block params (leading stage axis stripped by
        # shard_map to size 1) — squeeze it.
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        my_stage = jax.lax.axis_index(stage_axis)
        micro = x_all.reshape((m, mb) + x_all.shape[1:])

        def step(carry, t):
            buf, acc = carry
            # Stage 0 ingests microbatch t (while it exists); other stages
            # work on what arrived over the ring.
            feed = micro[jnp.minimum(t, m - 1)]
            x_in = jnp.where(my_stage == 0, feed, buf)
            y = block_fn(params, x_in)
            # The last stage finishes microbatch t - (S-1) at step t.
            out_idx = t - (n_stages - 1)
            is_out = (my_stage == n_stages - 1) & (out_idx >= 0)
            acc = jax.lax.cond(
                is_out,
                lambda a: jax.lax.dynamic_update_index_in_dim(
                    a, y, jnp.maximum(out_idx, 0), 0
                ),
                lambda a: a,
                acc,
            )
            buf = jax.lax.ppermute(y, stage_axis, fwd_perm)
            return (buf, acc), None

        init = (
            jnp.zeros((mb,) + x_all.shape[1:], x_all.dtype),
            jnp.zeros((m, mb) + x_all.shape[1:], x_all.dtype),
        )
        (_, acc), _ = jax.lax.scan(step, init, jnp.arange(steps))
        # Only the last stage holds real outputs; psum broadcasts them.
        acc = jnp.where(my_stage == n_stages - 1, acc, 0.0)
        acc = jax.lax.psum(acc, stage_axis)
        return acc.reshape((b,) + x_all.shape[1:])

    stage_spec = jax.tree_util.tree_map(
        lambda _: P(stage_axis), stacked_params
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(stage_spec, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, x)
