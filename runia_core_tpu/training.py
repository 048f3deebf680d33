"""Training utilities for the built-in model zoo.

The reference is strictly post-hoc (models arrive pre-trained); this module
rounds out the framework so the whole story — train a model, tap it, fit
detectors, score — runs inside one stack. Optax optimizer, BatchNorm state
threading, optional mesh sharding via parallel.mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["TrainState", "create_train_state", "make_train_step", "fit_classifier"]


@jax.tree_util.register_pytree_node_class
@dataclass
class TrainState:
    """Minimal functional train state: params + non-param collections +
    optimizer state."""

    params: Any
    extra_variables: Dict[str, Any]  # batch_stats etc.
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.extra_variables, self.opt_state, self.step), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    tx: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-3,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize variables and optimizer for a tapped model."""
    if tx is None:
        tx = optax.adam(learning_rate)
    variables = model.init(rng, sample_input)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return TrainState(
        params=params,
        extra_variables=extra,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    ), tx


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Optional[Callable] = None,
    has_batch_stats: Optional[bool] = None,
) -> Callable:
    """Jitted cross-entropy train step for (logits, taps)-returning models.

    Handles BatchNorm: when the model owns a ``batch_stats`` collection the
    forward runs with ``train=True`` and the running statistics are updated
    functionally in the returned state.
    """
    if loss_fn is None:
        def loss_fn(logits, labels):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

    @jax.jit
    def train_step(state: TrainState, images, labels):
        use_bn = "batch_stats" in state.extra_variables

        def compute_loss(params):
            variables = {"params": params, **state.extra_variables}
            if use_bn:
                (logits, taps), new_model_state = model.apply(
                    variables, images, train=True, mutable=["batch_stats"]
                )
            else:
                logits, taps = model.apply(variables, images)
                new_model_state = {}
            return loss_fn(logits, labels), (logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        extra = dict(state.extra_variables)
        extra.update(new_model_state)
        accuracy = jnp.mean(jnp.argmax(logits, -1) == labels)
        new_state = TrainState(
            params=new_params,
            extra_variables=extra,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "accuracy": accuracy}

    return train_step


def fit_classifier(
    model,
    data_iter: Iterable,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    epochs: int = 1,
    learning_rate: float = 1e-3,
    tx: Optional[optax.GradientTransformation] = None,
    log_every: int = 0,
) -> Tuple[Dict[str, Any], Dict[str, float]]:
    """Train a tapped classifier; returns (variables, final metrics).

    ``data_iter`` is re-iterated each epoch (e.g. a PrefetchLoader).
    """
    state, tx = create_train_state(model, rng, sample_input, tx, learning_rate)
    step_fn = make_train_step(model, tx)
    metrics = {}
    for epoch in range(epochs):
        for images, labels in data_iter:
            state, metrics = step_fn(
                state, jnp.asarray(np.asarray(images)),
                jnp.asarray(np.asarray(labels, dtype=np.int32)),
            )
            if log_every and int(state.step) % log_every == 0:
                print(
                    f"step {int(state.step)}: loss={float(metrics['loss']):.4f} "
                    f"acc={float(metrics['accuracy']):.3f}"
                )
    variables = {"params": state.params, **state.extra_variables}
    return variables, {k: float(v) for k, v in metrics.items()}
