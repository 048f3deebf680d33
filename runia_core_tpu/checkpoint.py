"""Checkpoint / resume for detector and PCA state.

The reference has no in-library persistence — fitted sklearn objects are
passed around in memory and features saved ad hoc with torch.load
(SURVEY.md section 5 "Checkpoint / resume"). Here detector state is an
explicit pytree of arrays (Postprocessor.state), so checkpointing is plain
``np.savez`` (or orbax for sharded arrays): save the state dict, re-load it
into a fresh detector with ``load_state``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Union

import numpy as np

from runia_core_tpu.detectors import postprocessors_dict
from runia_core_tpu.detectors.base import Postprocessor
from runia_core_tpu.reduction import PCAState

__all__ = [
    "save_detector",
    "load_detector",
    "save_pca",
    "load_pca",
    "save_state_dict",
    "load_state_dict",
    "save_state_dict_orbax",
    "load_state_dict_orbax",
]

_META_KEY = "__runia_meta__"


def _flatten_state(state: Dict[str, Any]) -> Dict[str, np.ndarray]:
    arrays = {}
    scalars = {}
    for key, value in state.items():
        if value is None:
            scalars[key] = None
        elif np.isscalar(value) or isinstance(value, (int, float, bool, str)):
            scalars[key] = value
        else:
            arrays[key] = np.asarray(value)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(scalars).encode(), dtype=np.uint8
    )
    return arrays


def _unflatten_state(npz) -> Dict[str, Any]:
    state: Dict[str, Any] = {}
    for key in npz.files:
        if key == _META_KEY:
            continue
        state[key] = npz[key]
    meta = json.loads(bytes(npz[_META_KEY].tolist()).decode())
    state.update(meta)
    return state


def save_state_dict(path: Union[str, os.PathLike], state: Dict[str, Any]) -> None:
    """Persist a state dict of arrays + scalars to one .npz file."""
    np.savez(path, **_flatten_state(state))


def load_state_dict(path: Union[str, os.PathLike]) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as npz:
        return _unflatten_state(npz)


def save_detector(path: Union[str, os.PathLike], detector: Postprocessor,
                  name: Optional[str] = None) -> None:
    """Save a fitted detector's state (+ its registry name for re-creation)."""
    state = dict(detector.state)
    if name is None:
        for reg_name, cls in postprocessors_dict.items():
            if type(detector) is cls:
                name = reg_name
                break
    assert name is not None, "Pass name= for unregistered detector classes"
    state["__detector_name__"] = name
    save_state_dict(path, state)


def load_detector(path: Union[str, os.PathLike], cfg=None) -> Postprocessor:
    """Re-create a fitted detector from a saved state file."""
    state = load_state_dict(path)
    name = state.pop("__detector_name__")
    detector = postprocessors_dict[name](cfg=cfg)
    detector.load_state(state)  # _rehydrate rebuilds derived objects
    if "threshold" in state:
        detector.threshold = float(np.asarray(state["threshold"]))
    return detector


def save_state_dict_orbax(path: Union[str, os.PathLike], state: Dict[str, Any]) -> None:
    """Persist a (possibly sharded) state pytree with orbax.

    Use this instead of :func:`save_state_dict` for mesh-sharded detector
    states or model params — orbax writes each shard from its owning host
    and restores with the original shardings.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state)


def load_state_dict_orbax(path: Union[str, os.PathLike]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def save_pca(path: Union[str, os.PathLike], pca: PCAState) -> None:
    save_state_dict(
        path,
        {
            "mean": pca.mean,
            "components": pca.components,
            "explained_variance": pca.explained_variance,
            "whiten": bool(pca.whiten),
        },
    )


def load_pca(path: Union[str, os.PathLike]) -> PCAState:
    state = load_state_dict(path)
    import jax.numpy as jnp

    return PCAState(
        mean=jnp.asarray(state["mean"]),
        components=jnp.asarray(state["components"]),
        explained_variance=jnp.asarray(state["explained_variance"]),
        whiten=bool(state["whiten"]),
    )
