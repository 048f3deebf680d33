"""Post-training int8 quantization (PTQ) for the flax ResNet family.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate; measured on
the headline ResNet-18/32px conv chain an int8 forward (including all the
quantize/requantize elementwise work) is ~1.5x the bf16 forward. This
module turns a trained/converted :class:`runia_core_tpu.models.ResNet`
into that int8 program without changing the public scoring API:

    qforward = quantize_resnet(model, variables, calib_images)
    # same contract as build_tapped_forward: images -> (logits, taps)

Scheme (standard production PTQ):

- **BN folding**: inference-mode BatchNorm is a per-channel affine, so
  ``BN(conv(x, w))`` folds to ``conv(x, w * g) + (beta - mean * g)`` with
  ``g = gamma / sqrt(var + eps)`` — the norm disappears from the program.
- **Weights**: symmetric per-output-channel int8 on the BN-folded kernel
  (``scale_c = max|w_c| / 127``), matching ``quantize_llama_params``.
- **Activations**: symmetric per-tensor int8; each conv input's scale is
  calibrated from a quantile of |x| over a calibration batch (default
  99.9% — clipping the outlier tail costs less than the resolution the
  tail would waste).
- **Compute**: int8 conv accumulating int32 (``preferred_element_type``),
  then one fused per-channel f32 rescale + bias + relu; residual adds in
  f32. Taps (``pre_pool`` etc.) and logits are emitted in f32, so the
  downstream LaREx stack (MC-DropBlock -> entropy -> PCA -> Mahalanobis)
  is numerically unchanged.

The reference has no quantized inference path (its perf story delegates to
torch/CUDA deps entirely — SURVEY.md section 2.2); this is a TPU-native
capability addition, gated behind an explicit opt-in call.

The calibration pass runs this module's own pure-JAX mirror of
``ResNet.__call__`` in f32 (agrees with ``model.apply`` to within BN-fold
reassociation noise; tests pin rtol 1e-4) so the activation statistics see
the tensors the quantized program will.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from runia_core_tpu.models.resnet import ResNet, ResNetBlock

__all__ = ["quantize_resnet", "quantize_resnet_params"]

_BN_EPS = 1e-5  # matches models/resnet.py norm partial


# ---------------------------------------------------------------------------
# Structural walk: one function drives calibration, quantization, and the
# quantized forward, so the three can never drift apart.
# ---------------------------------------------------------------------------


def _is_basic(model: ResNet) -> bool:
    """True for ResNetBlock (two-conv) stacks, False for bottleneck."""
    return model.block_cls is ResNetBlock or getattr(
        model.block_cls, "func", None
    ) is ResNetBlock


def _conv_sites(model: ResNet) -> List[Dict[str, Any]]:
    """Static description of every conv+BN site in call order.

    Each site: {name, parent, conv, bn, stride, kind}, where ``parent`` is
    the param-tree scope ("" for top level, "stage1_block0" etc.),
    ``conv``/``bn`` the layer names inside that scope.
    """
    sites = [
        {
            "parent": "",
            "conv": "conv_init",
            "bn": "bn_init",
            "stride": 1 if model.cifar_stem else 2,
            "kind": "stem",
        }
    ]
    basic = _is_basic(model)
    for i, block_size in enumerate(model.stage_sizes):
        for j in range(block_size):
            parent = f"stage{i + 1}_block{j}"
            stride = 2 if i > 0 and j == 0 else 1
            if basic:
                convs = [("Conv_0", "BatchNorm_0", stride), ("Conv_1", "BatchNorm_1", 1)]
            else:
                convs = [
                    ("Conv_0", "BatchNorm_0", 1),
                    ("Conv_1", "BatchNorm_1", stride),
                    ("Conv_2", "BatchNorm_2", 1),
                ]
            for conv, bn, s in convs:
                sites.append(
                    {"parent": parent, "conv": conv, "bn": bn, "stride": s,
                     "kind": "block"}
                )
            # conv_proj existence is shape-dependent; resolved against the
            # actual param tree at fold time.
            sites.append(
                {"parent": parent, "conv": "conv_proj", "bn": "norm_proj",
                 "stride": stride, "kind": "proj"}
            )
    return sites


def _get_scope(tree: Dict, parent: str) -> Dict:
    return tree[parent] if parent else tree


def _fold_bn(params: Dict, stats: Dict, site: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """BN-folded f32 kernel (H, W, I, O) and bias (O,) for one site."""
    pscope = _get_scope(params, site["parent"])
    sscope = _get_scope(stats, site["parent"])
    w = np.asarray(pscope[site["conv"]]["kernel"], np.float32)
    bn_p = pscope[site["bn"]]
    bn_s = sscope[site["bn"]]
    g = np.asarray(bn_p["scale"], np.float32) / np.sqrt(
        np.asarray(bn_s["var"], np.float32) + _BN_EPS
    )
    bias = np.asarray(bn_p["bias"], np.float32) - np.asarray(
        bn_s["mean"], np.float32
    ) * g
    return w * g[None, None, None, :], bias


def _site_exists(params: Dict, site: Dict) -> bool:
    return site["conv"] in _get_scope(params, site["parent"])


def _site_key(site: Dict) -> str:
    return f"{site['parent']}/{site['conv']}" if site["parent"] else site["conv"]


def _conv_padding(model: ResNet, site: Dict, kernel_hw: Tuple[int, int]):
    if site["kind"] == "stem" and not model.cifar_stem:
        return [(3, 3), (3, 3)]  # explicit in ResNet.__call__
    if model.torch_padding:
        return [(k // 2, k // 2) for k in kernel_hw]
    return "SAME"


def _conv(x, w, stride, padding, acc_dtype):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        padding,
        dimension_numbers=dn,
        preferred_element_type=acc_dtype,
    )


def _forward(
    model: ResNet,
    x: jnp.ndarray,
    conv_bn: Callable[[jnp.ndarray, Dict], jnp.ndarray],
    head_params: Dict,
):
    """The ResNet.__call__ control flow with conv+BN delegated to ``conv_bn``.

    ``conv_bn(x, site)`` returns the f32 post-BN (pre-relu) activation.
    Mirrors models/resnet.py line for line; tests pin agreement with the
    flax forward at rtol 1e-4 (BN folding reassociates the f32 arithmetic).
    """
    sites = iter(_conv_sites(model))
    taps: Dict[str, jnp.ndarray] = {}

    x = jax.nn.relu(conv_bn(x, next(sites)))
    if not model.cifar_stem:
        pool_pad = ((1, 1), (1, 1)) if model.torch_padding else "SAME"
        x = _max_pool(x, (3, 3), (2, 2), pool_pad)
    taps["stem"] = x

    n_convs = 2 if _is_basic(model) else 3
    for i, block_size in enumerate(model.stage_sizes):
        for j in range(block_size):
            residual = x
            y = x
            for c in range(n_convs):
                site = next(sites)
                y = conv_bn(y, site)
                if c < n_convs - 1:
                    y = jax.nn.relu(y)
            proj_site = next(sites)
            if residual.shape != y.shape:
                residual = conv_bn(residual, proj_site)
            x = jax.nn.relu(residual + y)
        taps[f"block{i + 1}"] = x

    taps["pre_pool"] = x
    x = jnp.mean(x, axis=(1, 2))
    taps["penultimate"] = x
    logits = (
        x @ jnp.asarray(head_params["kernel"], x.dtype)
        + jnp.asarray(head_params["bias"], x.dtype)
    )
    return logits, taps


def _max_pool(x, window, strides, padding):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1,) + window + (1,),
        (1,) + strides + (1,),
        padding if isinstance(padding, str) else ((0, 0),) + tuple(padding) + ((0, 0),),
    )


def _float_forward(model: ResNet, variables: Dict) -> Callable:
    """The f32 BN-folded mirror of ``model.apply`` (calibration path).

    Exposed for tests, which pin that the mirror agrees with the flax
    forward — the guarantee that calibration statistics are collected on
    the right tensors.
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    def conv_bn(x, site):
        w, bias = _fold_bn(params, stats, site)
        pad = _conv_padding(model, site, w.shape[:2])
        return _conv(x, jnp.asarray(w), site["stride"], pad, jnp.float32) + bias

    @jax.jit
    def forward(images):
        return _forward(model, jnp.asarray(images, jnp.float32), conv_bn,
                        params["head"])

    return forward


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def quantize_resnet_params(
    model: ResNet,
    variables: Dict,
    calib_images: np.ndarray,
    act_quantile: float = 99.9,
    calib_device: str = "cpu",
) -> Dict[str, Dict[str, np.ndarray]]:
    """Calibrate + quantize. Returns {site_key: {w_q, w_scale, bias, x_scale}}.

    ``calib_images`` should be a representative in-distribution batch (a few
    hundred images); statistics are per-tensor quantiles of |conv input|.

    Calibration is a one-time offline pass producing a handful of scalars,
    so by default it runs on the host CPU backend (``calib_device="cpu"``)
    — on a remote/tunneled TPU a fresh ~1-min compile for the capture
    program would otherwise dominate quantization wall-clock. Pass
    ``calib_device=None`` to use the default device.
    """
    if getattr(model, "s2d_stem", False):
        raise NotImplementedError(
            "quantize_resnet does not model the space-to-depth stem: the "
            "structural mirror would skip the input rearrange and run the "
            "4x4 kernel at stride 2, silently diverging. Quantize the plain "
            "7x7-stem model (int8 only wins on small-image compute-bound "
            "configs, where s2d_stem is moot — see docs/PERFORMANCE.md)."
        )
    if model.output_stride is not None or not model.include_head:
        raise NotImplementedError(
            "quantize_resnet supports plain classification ResNets only "
            "(output_stride=None, include_head=True): the structural mirror "
            "does not model atrous stages, and dilated backbones run at "
            "large HBM-bound resolutions where int8 loses anyway — see "
            "docs/PERFORMANCE.md 'Where int8 does NOT win'."
        )
    params = variables["params"]
    stats = variables["batch_stats"]

    records: Dict[str, jnp.ndarray] = {}

    def calib_conv_bn(x, site):
        w, bias = _fold_bn(params, stats, site)
        # Per-tensor |x| quantile, reduced ON DEVICE: only one scalar per
        # conv site crosses to the host (shipping the raw activations costs
        # ~GBs and dominates calibration wall-clock on a remote device).
        records[_site_key(site)] = jnp.percentile(
            jnp.abs(x.astype(jnp.float32)), act_quantile
        )
        pad = _conv_padding(model, site, w.shape[:2])
        return _conv(x, jnp.asarray(w), site["stride"], pad, jnp.float32) + bias

    # Run the calibration forward once, capturing every conv-input scale.
    def run(images):
        records.clear()
        out = _forward(model, images, calib_conv_bn, params["head"])
        return out, dict(records)

    import contextlib
    import warnings

    ctx = contextlib.nullcontext()
    if calib_device is not None:
        try:
            ctx = jax.default_device(jax.devices(calib_device)[0])
        except RuntimeError:
            warnings.warn(
                f"calibration backend {calib_device!r} unavailable; "
                "calibrating on the default device (on a remote TPU this "
                "pays an extra program compile)",
                stacklevel=2,
            )
    with ctx:
        (_, _), rec = jax.jit(run)(jnp.asarray(calib_images, jnp.float32))
        captured = {k: float(np.asarray(jax.device_get(v))) for k, v in rec.items()}

    qparams: Dict[str, Dict[str, np.ndarray]] = {}
    for site in _conv_sites(model):
        if not _site_exists(params, site):
            continue
        key = _site_key(site)
        if key not in captured:
            continue
        w, bias = _fold_bn(params, stats, site)
        w_scale = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0), 1e-12) / 127.0
        w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
        x_scale = np.float32(max(captured[key], 1e-12) / 127.0)
        qparams[key] = {
            "w_q": w_q,
            "w_scale": w_scale.astype(np.float32),
            "bias": bias.astype(np.float32),
            "x_scale": x_scale,
        }
    return qparams


def quantize_resnet(
    model: ResNet,
    variables: Dict,
    calib_images: np.ndarray,
    taps: Sequence[str] = ("pre_pool",),
    act_quantile: float = 99.9,
    qparams: Dict | None = None,
    calib_device: str = "cpu",
) -> Callable:
    """Build a jitted int8 forward with the ``build_tapped_forward`` contract.

    Returns ``forward(images) -> (logits, {tap: f32 array})``. Pass a
    precomputed ``qparams`` (from :func:`quantize_resnet_params`, e.g.
    reloaded from a checkpoint) to skip calibration.
    """
    if qparams is None:
        qparams = quantize_resnet_params(
            model, variables, calib_images, act_quantile=act_quantile,
            calib_device=calib_device,
        )
    head = {
        "kernel": np.asarray(variables["params"]["head"]["kernel"], np.float32),
        "bias": np.asarray(variables["params"]["head"]["bias"], np.float32),
    }
    dev_q = jax.tree_util.tree_map(jnp.asarray, qparams)
    wanted = tuple(taps)

    def qconv_bn(x, site):
        key = _site_key(site)
        p = dev_q[key]
        sx = p["x_scale"]
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        yi = _conv(
            xq, p["w_q"], site["stride"],
            _conv_padding(model, site, p["w_q"].shape[:2]), jnp.int32,
        )
        return yi.astype(jnp.float32) * (sx * p["w_scale"]) + p["bias"]

    @jax.jit
    def forward(images):
        logits, all_taps = _forward(
            model, jnp.asarray(images, jnp.float32), qconv_bn, head
        )
        return logits, {name: all_taps[name] for name in wanted}

    return forward
