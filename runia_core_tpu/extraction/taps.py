"""Feature taps for arbitrary flax models (the functional "Hook" equivalent).

The reference attaches mutable forward hooks to torch layers
(runia_core/feature_extraction/utils.py:27-56). For models built in this
framework, intermediates are returned directly; for *arbitrary* flax modules
that were not written with taps, this module captures intermediates purely
via ``flax.linen.Module.apply(..., capture_intermediates=...)`` — no model
surgery, no mutable state, fully jittable.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Union

import jax
import jax.numpy as jnp

__all__ = ["Hook", "tap_flax_model", "apply_dropout"]


def apply_dropout(module):
    """Compatibility no-op for the reference's in-place dropout activation
    (reference utils.py:59-67, which flips torch Dropout/DropBlock layers to
    train mode).

    In this framework stochasticity is explicit: dropout/DropBlock only run
    when a PRNG key is supplied (ops/dropblock.py, sampling.py), so there is
    no global train/eval mode to toggle. Returns the module unchanged.
    """
    return module


def tap_flax_model(
    module,
    variables,
    capture: Union[Sequence[str], Callable] = ("__call__",),
    tap_aliases: Dict[str, str] = None,
    **apply_kwargs,
) -> Callable:
    """Build a tapped forward from an arbitrary flax module.

    Args:
        module: any flax.linen.Module.
        variables: its variable collections.
        capture: either a sequence of submodule path substrings to capture
            (e.g. ``("block_3", "dense")``) or a flax capture filter
            ``(mdl, method_name) -> bool``.
        tap_aliases: optional {tap_name: path_substring} renaming so
            downstream code can use stable names like "pre_pool".

    Returns:
        jitted forward: images -> (outputs, {tap_name: last intermediate}).
    """
    if callable(capture) and not isinstance(capture, (list, tuple)):
        filter_fn = capture
    else:
        substrings = tuple(capture)

        def filter_fn(mdl, method_name):
            path = "/".join(map(str, mdl.path))
            return any(s in path for s in substrings)

    aliases = tap_aliases or {}

    @jax.jit
    def forward(inputs):
        outputs, state = module.apply(
            variables,
            inputs,
            capture_intermediates=filter_fn,
            mutable=["intermediates"],
            **apply_kwargs,
        )
        taps: Dict[str, jnp.ndarray] = {}

        def walk(tree, prefix=""):
            for key, value in tree.items():
                path = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    walk(value, path)
                elif key == "__call__":
                    # flax stores a tuple of captured outputs; take the last.
                    out = value[-1] if isinstance(value, tuple) else value
                    taps[prefix] = out

        walk(state["intermediates"])
        for alias, substring in aliases.items():
            for path, value in list(taps.items()):
                if substring in path:
                    taps[alias] = value
                    break
        return outputs, taps

    return forward


class Hook:
    """Compatibility shim for reference-style code (utils.py:27-56).

    There are no mutable forward hooks in a functional framework; this class
    exists so ported code that *stores* tap outputs in a Hook-shaped object
    keeps working: construct it with a tap name, then call
    ``hook.capture(taps)`` after a tapped forward to populate
    ``hook.output``.
    """

    def __init__(self, tap_name: str, backward: bool = False):
        assert not backward, "backward hooks have no functional equivalent"
        self.tap_name = tap_name
        self.input = None
        self.output = None

    def capture(self, taps: Dict[str, jnp.ndarray]) -> "Hook":
        self.output = taps[self.tap_name]
        return self

    def close(self):
        self.input = None
        self.output = None
