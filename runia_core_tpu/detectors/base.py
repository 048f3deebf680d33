"""Postprocessor base classes, registry, and threshold calculus.

API-compatible with the reference's abstract classes
(runia_core/inference/abstract_classes.py:58-211,373-424) and registry
(runia_core/inference/postprocessors.py:43-75), with two deliberate fixes over
the reference (SURVEY.md section 7.4):

* every registered class is constructible as ``cls(cfg=cfg)`` (the reference's
  OodPostprocessors required a positional ``flip_sign`` and broke the
  registry-driven sweep);
* detector state is an explicit pytree of arrays (``state`` property), so
  re-fitting is functional and checkpointing is ``np.savez``/orbax-able,
  instead of the reference's externally-poked ``_setup_flag``.
"""

from __future__ import annotations

import time
import warnings
from abc import ABC, abstractmethod
from typing import Any, Callable, Dict, List, Optional, Union

import jax
import numpy as np

__all__ = [
    "record_time",
    "Postprocessor",
    "OodPostprocessor",
    "get_baselines_thresholds",
    "get_method_threshold",
    "postprocessors_dict",
    "postprocessor_input_dict",
    "register_postprocessor",
]

ndarray = np.ndarray

# Accepted input type names (reference postprocessors.py:43)
_VALID_INPUT_TYPES = ("latent_space_means", "features", "logits")
# Postprocessor registry: name -> class
postprocessors_dict: Dict[str, type] = {}
# Postprocessor input registry: name -> list of required input kinds
postprocessor_input_dict: Dict[str, List[str]] = {}


def register_postprocessor(postprocessor_name: str, postprocessor_input: List[str]):
    """Class decorator registering a postprocessor under one or more names.

    Mirrors reference postprocessors.py:50-75. ``postprocessor_name`` may be a
    string or a list of alias strings (we register the README's LaRED/LaREM/
    LaREK names alongside the code names KDE/MD/KNN).
    """
    names = (
        [postprocessor_name] if isinstance(postprocessor_name, str) else list(postprocessor_name)
    )

    def decorator(cls):
        for input_type in postprocessor_input:
            assert (
                input_type in _VALID_INPUT_TYPES
            ), f"Invalid input type {input_type}. Specify at least one of {_VALID_INPUT_TYPES}."
        for name in names:
            postprocessors_dict[name] = cls
            postprocessor_input_dict[name] = list(postprocessor_input)
        return cls

    return decorator


def record_time(function: Callable) -> Callable:
    """Decorator returning ``(result, seconds)``.

    TPU-aware version of the reference timer (abstract_classes.py:35-52): JAX
    dispatch is asynchronous, so we force completion of the result before
    reading the clock — otherwise the measured time would only cover
    dispatch. On remote/tunneled backends ``block_until_ready`` itself
    returns at enqueue, so we fetch one element of one result leaf (a ~4
    byte host transfer that drains the device's FIFO execution queue).
    """

    def wrapper(*args, **kwargs):
        start_time = time.monotonic()
        function_return = function(*args, **kwargs)
        leaves = [leaf for leaf in jax.tree_util.tree_leaves(function_return)
                  if isinstance(leaf, jax.Array)]
        if leaves:
            jax.device_get(leaves[0].ravel()[:1])
        delta_t = time.monotonic() - start_time
        return function_return, delta_t

    return wrapper


class Postprocessor(ABC):
    """Base class for post-hoc OoD scoring (reference abstract_classes.py:58-130).

    Subclasses implement ``setup`` (fit on InD data) and ``postprocess``
    (score new data). The fitted state is exposed as a dict-of-arrays pytree
    via :attr:`state` so it can be serialized and re-loaded with
    :meth:`load_state`.
    """

    def __init__(self, cfg=None):
        self._setup_flag = False
        self._state: Dict[str, Any] = {}

    @property
    def state(self) -> Dict[str, Any]:
        """Fitted detector state as a pytree (arrays + scalars)."""
        return self._state

    def load_state(self, state: Dict[str, Any]) -> None:
        """Restore a previously fitted state (the checkpoint/resume path)."""
        self._state = dict(state)
        self._setup_flag = True
        self._rehydrate()

    def _rehydrate(self) -> None:
        """Rebuild instance attributes from :attr:`state` after a load.

        Default: every state entry becomes an attribute (covers detectors
        whose scoring path reads plain array attributes). Subclasses with
        derived objects (KDE density, GMM state) override this.
        """
        for key, value in self._state.items():
            if not key.startswith("__"):
                setattr(self, key, value)

    @abstractmethod
    def setup(self, ind_train_data: ndarray, **kwargs) -> None:
        raise NotImplementedError

    @abstractmethod
    def postprocess(self, test_data: ndarray, **kwargs) -> ndarray:
        raise NotImplementedError

    def __call__(self, test_data: ndarray, **kwargs) -> ndarray:
        return self.postprocess(test_data, **kwargs)

    def _warn_if_fitted(self, name: str) -> bool:
        """Returns True (and warns) if already fitted; callers skip re-fit."""
        if self._setup_flag:
            warnings.warn(f"{name} already trained")
            return True
        return False


class OodPostprocessor(Postprocessor):
    """Postprocessor with sign flipping and z-score threshold support
    (reference abstract_classes.py:133-211)."""

    def __init__(self, flip_sign: bool = False, cfg=None):
        super().__init__(cfg)
        self.flip_sign = flip_sign
        self.threshold: Optional[float] = None

    def flip_sign_fn(
        self, scores: Union[Dict[str, ndarray], ndarray]
    ) -> Union[Dict[str, ndarray], ndarray]:
        if self.flip_sign:
            if isinstance(scores, dict):
                for method, values in scores.items():
                    scores[method] = values * -1
            elif isinstance(scores, (np.ndarray, jax.Array)):
                scores = scores * -1
            else:
                raise ValueError("scores must be a dict or ndarray")
        return scores

    def set_threshold(self, ind_test_scores: ndarray, z_score_percentile: float = 1.645) -> None:
        self.threshold = get_method_threshold(
            scores=ind_test_scores, z_score_percentile=z_score_percentile
        )
        self._state["threshold"] = self.threshold
        self._setup_flag = True


def get_method_threshold(scores: ndarray, z_score_percentile: float) -> float:
    """mean - z * std threshold (higher score = InD), reference
    abstract_classes.py:408-424."""
    scores = np.asarray(scores)
    mean = float(np.mean(scores))
    std = float(np.std(scores))
    return mean - (z_score_percentile * std)


def get_baselines_thresholds(
    baselines_names: List[str],
    baselines_scores_dict: Dict[str, ndarray],
    z_score_percentile: float = 1.645,
) -> Dict[str, float]:
    """Per-baseline thresholds; 'raw' is pinned to 0.0 so no prediction is
    corrected (reference abstract_classes.py:373-405)."""
    thresholds = {}
    for baseline_name in baselines_names:
        if baseline_name == "raw":
            thresholds[baseline_name] = 0.0
        else:
            thresholds[baseline_name] = get_method_threshold(
                scores=baselines_scores_dict[baseline_name],
                z_score_percentile=z_score_percentile,
            )
    return thresholds
