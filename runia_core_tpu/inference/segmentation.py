"""Per-pixel segmentation uncertainty: fused MC forward -> dense maps.

The reference's segmentation support stops at image-level channel-mean
extraction (``deeplabv3p_get_ls_mcd_samples``, reference
image_level.py:580-631) — it never produces dense uncertainty maps. For
production anomaly segmentation the per-pixel epistemic signal is the
deliverable, so this module adds it the TPU way: the MC axis is vmapped
over folded PRNG keys inside ONE jitted program, and only the (B, H, W)
maps reach the host.

Outputs per pixel (the standard MC-dropout decomposition; same math as
``detectors.funcs.get_mcd_pred_uncertainty_score`` with spatial dims —
reference funcs.py:378-465):

  - ``pred_h``:  H[E_s p]          total predictive entropy
  - ``mi``:      pred_h − E_s H[p] mutual information (epistemic part)
  - ``msp``:     max_c E_s p       mean max-softmax (confidence baseline)
  - ``pred``:    argmax_c E_s p    the MC-marginal segmentation

The model contract is the stochastic-forward one used across the
framework: ``apply_fn(images, key) -> (logits, taps)`` (or bare logits)
with per-pixel class logits (B, H, W, C) and dropout/DropBlock noise
driven by ``key`` (e.g. ``DeepLabV3Plus(dropout_rate=0.5)``).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["build_pixel_uncertainty_scorer"]

_EPS = 1e-12  # guards 0*log(0) at saturated pixels


def build_pixel_uncertainty_scorer(
    apply_fn: Callable,
    mc_samples: int = 8,
) -> Callable:
    """Fuse N stochastic forwards + the MC-dropout decomposition.

    Returns jitted ``(images, key) -> {"pred": (B,H,W) int32,
    "pred_h"/"mi"/"msp": (B,H,W) f32}``.
    """

    @jax.jit
    def score(images, key) -> Dict[str, jnp.ndarray]:
        keys = jax.random.split(key, mc_samples)

        def one(k):
            out = apply_fn(images, k)
            logits = out[0] if isinstance(out, tuple) else out
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        logp = jax.vmap(one)(keys)  # (S, B, H, W, C)
        p = jnp.exp(logp)
        p_mean = jnp.mean(p, axis=0)  # (B, H, W, C)
        pred_h = -jnp.sum(p_mean * jnp.log(p_mean + _EPS), axis=-1)
        exp_h = jnp.mean(-jnp.sum(p * logp, axis=-1), axis=0)
        return {
            "pred": jnp.argmax(p_mean, axis=-1).astype(jnp.int32),
            "pred_h": pred_h,
            "mi": pred_h - exp_h,
            "msp": jnp.max(p_mean, axis=-1),
        }

    return score
