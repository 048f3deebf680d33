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
    accum_steps: int = 1,
) -> Callable:
    """Jitted cross-entropy train step for (logits, taps)-returning models.

    Handles BatchNorm: when the model owns a ``batch_stats`` collection the
    forward runs with ``train=True`` and the running statistics are updated
    functionally in the returned state.

    ``accum_steps > 1`` enables gradient accumulation: the batch splits into
    that many microbatches scanned sequentially, their mean-loss gradients
    averaged before one optimizer update — activation memory drops by the
    same factor (pair with the models' ``remat=True`` for the full
    memory-bound training recipe). With equal microbatch sizes the averaged
    gradient equals the full-batch gradient exactly (up to float summation
    order), except that BatchNorm statistics are per-microbatch.
    """
    if loss_fn is None:
        def loss_fn(logits, labels):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

    def compute_loss(params, extra_variables, images, labels):
        # has_batch_stats overrides autodetection (e.g. freeze BN stats by
        # passing False even though the variables carry batch_stats).
        use_bn = (
            has_batch_stats
            if has_batch_stats is not None
            else "batch_stats" in extra_variables
        )
        variables = {"params": params, **extra_variables}
        if use_bn:
            (logits, taps), new_model_state = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
        else:
            logits, taps = model.apply(variables, images)
            new_model_state = {}
        return loss_fn(logits, labels), (logits, new_model_state)

    grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

    @jax.jit
    def train_step(state: TrainState, images, labels):
        if accum_steps == 1:
            (loss, (logits, new_model_state)), grads = grad_fn(
                state.params, state.extra_variables, images, labels
            )
            accuracy = jnp.mean(jnp.argmax(logits, -1) == labels)
        else:
            b = images.shape[0]
            assert b % accum_steps == 0, (
                f"batch {b} not divisible by accum_steps={accum_steps}"
            )
            mb = b // accum_steps
            micro_images = images.reshape((accum_steps, mb) + images.shape[1:])
            micro_labels = labels.reshape(accum_steps, mb)

            def body(carry, micro):
                grads_acc, loss_acc, acc_acc, extra = carry
                imgs_i, labs_i = micro
                (loss_i, (logits_i, new_ms)), grads_i = grad_fn(
                    state.params, extra, imgs_i, labs_i
                )
                extra = dict(extra)
                extra.update(new_ms)
                acc_i = jnp.mean(jnp.argmax(logits_i, -1) == labs_i)
                grads_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g, grads_acc, grads_i
                )
                return (grads_acc, loss_acc + loss_i, acc_acc + acc_i, extra), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss, accuracy, new_model_state), _ = jax.lax.scan(
                body,
                (zeros, jnp.zeros(()), jnp.zeros(()), state.extra_variables),
                (micro_images, micro_labels),
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps
            accuracy = accuracy / accum_steps

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        extra = dict(state.extra_variables)
        extra.update(new_model_state)
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
