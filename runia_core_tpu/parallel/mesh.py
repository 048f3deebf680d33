"""Mesh construction and sharded execution helpers.

The reference has no distributed runtime at all (SURVEY.md section 2.4); this
module is where the TPU build adds one, the JAX way: a ``jax.sharding.Mesh``
over the chips, ``NamedSharding`` annotations on batches and parameters, and
XLA-inserted collectives over ICI. Axes:

  - ``data``: batch/data parallelism — every detector's ``score`` is a pure
    function of (state, batch), so DP is free;
  - ``model``: tensor parallelism for wide layers (classifier heads, dense
    feature banks — e.g. the kNN train bank sharded via
    ops.knn.sharded_kth_neighbor).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "shard_batch",
    "replicate",
    "sharded_train_step",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-host JAX runtime (TPU pod slices).

    On single-host (including this test environment) it is a no-op returning
    the local device count. On pods, call once per host before any jax op;
    afterwards ``jax.devices()`` spans the slice and ``make_mesh`` builds
    meshes whose ``data`` axis crosses hosts — collectives ride ICI within a
    slice and DCN across slices, inserted by XLA from the same shardings.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices.

    If the default backend has too few devices (e.g. one real TPU chip) but a
    CPU backend with enough virtual devices exists
    (``--xla_force_host_platform_device_count``), the CPU devices are used —
    this keeps multichip dry runs working even where the platform cannot be
    selected via environment variables.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                cpu_devices = jax.devices("cpu")
            except RuntimeError:
                cpu_devices = []
            if len(cpu_devices) >= n_devices:
                devices = cpu_devices
    if n_devices is None:
        n_devices = len(devices)
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    assert n_devices % model_parallel == 0, (
        f"{n_devices} devices not divisible by model_parallel={model_parallel}"
    )
    grid = np.array(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names)


def shard_batch(x: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """Place a batch with its leading dim sharded across the data axis."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def sharded_train_step(
    model,
    mesh: Mesh,
    learning_rate: float = 1e-3,
    head_path: Tuple[str, ...] = ("head", "kernel"),
    extra_variables: Optional[dict] = None,
) -> Callable:
    """Build a jitted SGD training step with dp (batch) + tp (head) sharding.

    The classifier head's kernel is column-sharded over the ``model`` axis;
    everything else is replicated. XLA inserts the psum for the gradient
    all-reduce over ``data`` and the collectives for the sharded matmul over
    ``model`` — no hand-written communication.

    Returns:
        step(params, batch_images, batch_labels) -> (params, loss), jitted
        over ``mesh``.
    """

    def shard_params(params):
        def place(path, leaf):
            names = tuple(getattr(p, "key", None) for p in path)
            if names[-len(head_path):] == head_path and leaf.ndim == 2:
                spec = P(None, "model")
            else:
                spec = P()
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map_with_path(place, params)

    extra = extra_variables or {}

    @jax.jit
    def step(params, images, labels):
        def loss_fn(p):
            logits, _ = model.apply({"params": p, **extra}, images, train=False)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - learning_rate * g, params, grads
        )
        return new_params, loss

    step.shard_params = shard_params
    return step
