"""Fully-sharded data parallelism (ZeRO-3) via GSPMD sharding annotations.

The reference has no distributed runtime at all (SURVEY.md section 2.4);
``sharded_train_step`` (mesh.py) adds dp+tp with replicated parameters. This
module adds the memory-bound regime: every parameter AND its Adam optimizer
state is sharded over the ``data`` axis (each device holds 1/N of every
large tensor), and XLA's SPMD partitioner inserts the all-gather before each
layer's use and the reduce-scatter on its gradient — the FSDP/ZeRO-3
schedule — from nothing but ``NamedSharding`` annotations. No parameter
wrapping, no hand-written collectives, and the model code is unchanged.

Combine with ``ResNet(remat=True)`` / ``LlamaLM`` rematerialization to trade
FLOPs for activation memory on top of the parameter sharding.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_spec", "fsdp_shard_params", "fsdp_train_step"]


def fsdp_spec(leaf: jnp.ndarray, n_shards: int, min_size: int = 2**14) -> P:
    """PartitionSpec sharding ``leaf``'s largest divisible dim over ``data``.

    Tensors smaller than ``min_size`` elements (norm scales, biases) stay
    replicated: gathering them costs more in latency than their footprint
    saves, the same heuristic torch FSDP applies via its wrapping policy.
    """
    if leaf.ndim == 0 or leaf.size < min_size:
        return P()
    dims = sorted(range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True)
    for d in dims:
        if leaf.shape[d] % n_shards == 0:
            return P(*(("data" if i == d else None) for i in range(leaf.ndim)))
    return P()


def fsdp_shard_params(params, mesh: Mesh, min_size: int = 2**14):
    """Place every leaf with its :func:`fsdp_spec` sharding on ``mesh``."""
    n = mesh.shape["data"]

    def place(leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, fsdp_spec(leaf, n, min_size))
        )

    return jax.tree_util.tree_map(place, params)


class AdamState(NamedTuple):
    step: jnp.ndarray
    mu: Tuple  # pytree, same structure/sharding as params
    nu: Tuple


def fsdp_train_step(
    model,
    mesh: Mesh,
    learning_rate: float = 1e-3,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    min_size: int = 2**14,
    extra_variables: Optional[dict] = None,
    task: str = "classifier",
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build a jitted Adam training step with FSDP parameter/state sharding.

    Per-leaf first/second Adam moments inherit the parameter's sharding, so
    the per-device optimizer footprint is 2/N of the parameters — the
    ZeRO-3 memory story. The update runs on the SHARDED tensors (pure
    elementwise work, no gather); only the forward/backward gathers weights.

    ``task`` selects the loss: ``"classifier"`` (images, int labels) or
    ``"causal_lm"`` (token batch; next-token cross entropy with the batch
    as its own shifted target — ``step(params, opt, tokens, tokens)``).
    A custom ``loss_fn(model_output, labels) -> scalar`` overrides both
    (``model_output`` is whatever ``model.apply`` returns).

    Returns:
        ``step(params, opt_state, inputs, labels) -> (params, opt_state,
        loss)``, jitted over ``mesh``; with helpers ``step.shard_params``
        (:func:`fsdp_shard_params`) and ``step.init_opt`` (zeros matching
        the sharded params).
    """
    assert task in ("classifier", "causal_lm"), task
    extra = extra_variables or {}
    b1, b2 = betas

    def init_opt(params) -> AdamState:
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(
            step=jnp.zeros((), jnp.int32),
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    # Donating params + opt_state lets XLA update the sharded tensors in
    # place — without it each step holds old AND new (params, mu, nu) live,
    # doubling exactly the footprint ZeRO-3 exists to shrink. Callers
    # already rebind: params, opt, loss = step(params, opt, ...).
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state: AdamState, inputs, labels):
        def objective(p):
            out = model.apply({"params": p, **extra}, inputs)
            if loss_fn is not None:
                return loss_fn(out, labels)
            logits = out[0] if isinstance(out, tuple) else out
            if task == "causal_lm":
                logp = jax.nn.log_softmax(logits[:, :-1])
                tgt = labels[:, 1:, None]
                return -jnp.mean(jnp.take_along_axis(logp, tgt, axis=2))
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=1)
            )

        loss, grads = jax.value_and_grad(objective)(params)
        t = opt_state.step + 1
        tf = t.astype(jnp.float32)

        def upd(p, g, m, v):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * jnp.square(g)
            mhat = m / (1 - b1**tf)
            vhat = v / (1 - b2**tf)
            return p - learning_rate * mhat / (jnp.sqrt(vhat) + eps), m, v

        out = jax.tree_util.tree_map(
            upd, params, grads, opt_state.mu, opt_state.nu
        )
        new_params = jax.tree_util.tree_map(
            lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple)
        )
        new_mu = jax.tree_util.tree_map(
            lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple)
        )
        new_nu = jax.tree_util.tree_map(
            lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple)
        )
        return new_params, AdamState(step=t, mu=new_mu, nu=new_nu), loss

    step.shard_params = lambda p: fsdp_shard_params(p, mesh, min_size)
    step.init_opt = init_opt
    return step
