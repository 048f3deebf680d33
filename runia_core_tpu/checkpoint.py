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
    "save_larex_pipeline",
    "load_larex_scorer",
    "save_llm",
    "load_llm",
]

_META_KEY = "__runia_meta__"


def _flatten_state(state: Dict[str, Any]) -> Dict[str, np.ndarray]:
    arrays = {}
    scalars = {}
    for key, value in state.items():
        if value is None:
            scalars[key] = None
        elif np.isscalar(value) or isinstance(value, (int, float, bool, str)):
            # np.float32(0.1) etc. pass np.isscalar but are not JSON
            # serializable — normalize to builtin types via .item().
            scalars[key] = value.item() if hasattr(value, "item") else value
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


def load_state_dict_orbax(
    path: Union[str, os.PathLike], like: Any = None
) -> Dict[str, Any]:
    """Restore an orbax checkpoint, optionally straight into a mesh layout.

    ``like`` is a pytree of arrays (or ShapeDtypeStructs) whose shardings
    the restored leaves should carry — e.g. the live FSDP-sharded params
    from ``fsdp_train_step.shard_params``. Each host then reads only its
    own shards and training resumes in place, with no replicated
    full-tree materialization. Without ``like`` the tree is restored
    unsharded (single-host convenience path).
    """
    import jax

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(os.path.abspath(path))
        abstract = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=getattr(a, "sharding", None)
            ),
            like,
        )
        return ckptr.restore(os.path.abspath(path), abstract)


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


def save_larex_pipeline(
    path: Union[str, os.PathLike],
    pca_state: Optional[PCAState],
    detector_state: Dict[str, Any],
    mcd_samples_nro: int = 16,
    drop_block_prob: float = 0.5,
    drop_block_size: int = 3,
    tap: str = "pre_pool",
    channel_axis: int = 3,
    detector: str = "MD",
) -> None:
    """Persist everything :func:`inference.build_larex_scorer` needs except
    the model itself, in one .npz artifact.

    Model params belong in their own (orbax) checkpoint — they are large,
    possibly sharded, and shared across detector configs; this bundles the
    fitted scoring head (PCA + detector state) with the MC/tap configuration
    so a serving process reconstructs the fused scorer in one call.
    """
    state: Dict[str, Any] = {
        "__mcd_samples_nro__": int(mcd_samples_nro),
        "__drop_block_prob__": float(drop_block_prob),
        "__drop_block_size__": int(drop_block_size),
        "__tap__": tap,
        "__channel_axis__": int(channel_axis),
        "__detector__": detector,
        "__has_pca__": pca_state is not None,
    }
    if pca_state is not None:
        state["pca.mean"] = np.asarray(pca_state.mean)
        state["pca.components"] = np.asarray(pca_state.components)
        state["pca.explained_variance"] = np.asarray(pca_state.explained_variance)
        state["__pca_whiten__"] = bool(pca_state.whiten)
    for key, value in detector_state.items():
        state[f"det.{key}"] = np.asarray(value)
    save_state_dict(path, state)


def load_larex_scorer(path: Union[str, os.PathLike], apply_fn) -> Any:
    """Rebuild the fused LaREx scorer from a saved pipeline artifact.

    ``apply_fn`` is the model forward (``images -> (logits, taps)``), e.g.
    from ``models.build_tapped_forward`` with params restored separately.
    Returns the jitted ``(images, key) -> (logits, scores)`` program.
    """
    import jax.numpy as jnp

    from runia_core_tpu.inference import build_larex_scorer

    state = load_state_dict(path)
    pca_state = None
    if state["__has_pca__"]:
        pca_state = PCAState(
            mean=jnp.asarray(state["pca.mean"]),
            components=jnp.asarray(state["pca.components"]),
            explained_variance=jnp.asarray(state["pca.explained_variance"]),
            whiten=bool(state["__pca_whiten__"]),
        )
    detector_state = {
        key[len("det."):]: jnp.asarray(value)
        for key, value in state.items()
        if key.startswith("det.")
    }
    return build_larex_scorer(
        apply_fn,
        pca_state=pca_state,
        detector_state=detector_state,
        mcd_samples_nro=int(state["__mcd_samples_nro__"]),
        drop_block_prob=float(state["__drop_block_prob__"]),
        drop_block_size=int(state["__drop_block_size__"]),
        tap=str(state["__tap__"]),
        channel_axis=int(state["__channel_axis__"]),
        detector=str(state["__detector__"]),
    )


def save_llm(path: Union[str, os.PathLike], model, params) -> None:
    """Persist a CausalLM/LlamaLM (architecture config + params) to one .npz.

    Completes the serving lifecycle for converted checkpoints: run
    ``models.convert_hf_llama`` (or ``quantize_llama_params``) once on a
    build host, ``save_llm``, then ``load_llm`` on serving hosts — no
    torch/transformers needed at serve time. int8/bf16 leaves round-trip
    at their stored dtypes.
    """
    import dataclasses

    import jax.numpy as jnp

    cfg = {}
    for f in dataclasses.fields(model):
        if f.name in ("parent", "name"):  # flax framework fields, not config
            continue
        v = getattr(model, f.name)
        if f.name in ("dtype",):
            v = jnp.dtype(v).name
        cfg[f.name] = v
    flat = {}
    for p, leaf in _tree_items(params):
        key = "/".join(str(getattr(k, "key", k)) for k in p)
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            # npy format has no bf16: store the raw bits + a key tag
            flat[key + "::bf16"] = arr.view(np.uint16)
        else:
            flat[key] = arr
    flat["__llm_config__"] = np.frombuffer(
        json.dumps({"class": type(model).__name__, "config": cfg}).encode(),
        dtype=np.uint8,
    )
    np.savez(path, **flat)


def _tree_items(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_items(v, prefix + (k,))
    else:
        yield prefix, tree


def load_llm(path: Union[str, os.PathLike]):
    """Inverse of :func:`save_llm` -> (model, params)."""
    import jax.numpy as jnp

    from runia_core_tpu.models import LlamaLM
    from runia_core_tpu.models.transformer import CausalLM

    classes = {"LlamaLM": LlamaLM, "CausalLM": CausalLM}
    with np.load(path, allow_pickle=False) as npz:
        meta = json.loads(bytes(npz["__llm_config__"]).decode())
        cfg = meta["config"]
        if "dtype" in cfg:
            cfg["dtype"] = jnp.dtype(cfg["dtype"])
        model = classes[meta["class"]](**cfg)
        params: Dict[str, Any] = {}
        for key in npz.files:
            if key == "__llm_config__":
                continue
            arr = npz[key]
            if key.endswith("::bf16"):
                key = key[: -len("::bf16")]
                arr = arr.view(jnp.bfloat16)
            node = params
            *parents, leaf = key.split("/")
            for part in parents:
                node = node.setdefault(part, {})
            node[leaf] = arr
    return model, params
