"""Logit-based OoD postprocessors: Energy, MSP, GEN.

TPU-native equivalents of reference runia_core/inference/postprocessors.py:
495-691. Scoring is a tiny jittable program; thresholds follow the reference's
mean - 1.645*std rule via ``set_threshold``.

Constructors accept ``cls(cfg=cfg)`` with sane defaults (the reference's
registry sweep broke on the required positional ``flip_sign``; SURVEY.md
section 7.4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.detectors.base import OodPostprocessor, register_postprocessor
from runia_core_tpu.detectors.funcs import generalized_entropy

__all__ = ["Energy", "MSP", "GEN"]

ndarray = np.ndarray


@jax.jit
def energy_score(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.special.logsumexp(logits, axis=1)


@jax.jit
def msp_score(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jax.nn.softmax(logits, axis=1), axis=1)


@register_postprocessor("energy", postprocessor_input=["logits"])
class Energy(OodPostprocessor):
    """Energy score: logsumexp over logits (postprocessors.py:495-551)."""

    def __init__(self, flip_sign: bool = False, cfg=None):
        super().__init__(flip_sign, cfg)

    def setup(self, ind_train_data: ndarray, **kwargs) -> None:
        ind_scores = np.asarray(energy_score(jnp.asarray(ind_train_data)))
        ind_scores = self.flip_sign_fn(ind_scores)
        self.set_threshold(ind_scores)

    def postprocess(self, test_data: ndarray, **kwargs) -> ndarray:
        assert self._setup_flag, "setup() must be called before postprocess()"
        scores = np.asarray(energy_score(jnp.asarray(test_data)))
        return self.flip_sign_fn(scores)


@register_postprocessor("msp", postprocessor_input=["logits"])
class MSP(OodPostprocessor):
    """Maximum softmax probability (postprocessors.py:554-608)."""

    def __init__(self, flip_sign: bool = False, cfg=None):
        super().__init__(flip_sign, cfg)

    def setup(self, ind_train_data: ndarray, **kwargs) -> None:
        ind_scores = np.asarray(msp_score(jnp.asarray(ind_train_data)))
        ind_scores = self.flip_sign_fn(ind_scores)
        self.set_threshold(ind_scores)

    def postprocess(self, test_data: ndarray, **kwargs) -> ndarray:
        assert self._setup_flag, "setup() must be called before postprocess()"
        scores = np.asarray(msp_score(jnp.asarray(test_data)))
        return self.flip_sign_fn(scores)


@register_postprocessor("gen", postprocessor_input=["logits"])
class GEN(OodPostprocessor):
    """Generalized entropy over top-M softmax probabilities
    (postprocessors.py:611-691, funcs.py:347-375)."""

    def __init__(
        self,
        flip_sign: bool = False,
        gamma: float = 0.1,
        num_classes: int = 10,
        cfg=None,
    ):
        super().__init__(flip_sign, cfg)
        if cfg is not None:
            gamma = getattr(cfg, "gen_gamma", gamma) if hasattr(cfg, "gen_gamma") else gamma
            num_classes = (
                getattr(cfg, "num_classes", num_classes)
                if hasattr(cfg, "num_classes")
                else num_classes
            )
        self.gamma = gamma
        self.num_classes = num_classes

    def _score(self, logits: ndarray) -> ndarray:
        softmaxed = jax.nn.softmax(jnp.asarray(logits), axis=1)
        return np.asarray(generalized_entropy(softmaxed, self.gamma, self.num_classes))

    def setup(self, ind_train_data: ndarray, **kwargs) -> None:
        ind_scores = self.flip_sign_fn(self._score(ind_train_data))
        self.set_threshold(ind_scores)

    def postprocess(self, test_data: ndarray, **kwargs) -> ndarray:
        assert self._setup_flag, "setup() must be called before postprocess()"
        return self.flip_sign_fn(self._score(test_data))
