"""ROIAlign on TPU via separable interpolation matrices + matmuls.

Replaces torchvision.ops.roi_align (C++/CUDA; reference usage:
runia_core/feature_extraction/object_level.py:283-293 with
``aligned=True``, ``spatial_scale = fmap_W / img_W``, ``sampling_ratio=-1``).

Instead of gathering grid samples per ROI (irregular memory access), we
exploit that ROIAlign is *linear* in the feature map and separable per axis:

    out[n, c, ph, pw] = sum_y sum_x  Ay[n, ph, y] * F[c, y, x] * Ax[n, pw, x]

where Ay/Ax are per-ROI interpolation matrices accumulating the bilinear
weights of all sampling points (divided by the per-axis grid count). The
whole op is then two dense matmuls per image — exactly what the MXU wants —
with only small scatter-adds to build the (N, out, H) weight matrices.

Semantics match torchvision exactly (continuous coordinates, half-pixel
``aligned`` offset, adaptive ``ceil(bin)`` sampling grid for
``sampling_ratio=-1``, zero outside [-1, size], edge clamping), up to a
static cap ``max_samples`` on the adaptive grid resolution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["roi_align"]


def _axis_weights(
    start: jnp.ndarray,  # (N,) roi start along this axis (continuous)
    bin_size: jnp.ndarray,  # (N,)
    grid_n: jnp.ndarray,  # (N,) int sampling points per bin along axis
    out_size: int,
    size: int,
    max_samples: int,
) -> jnp.ndarray:
    """(N, out_size, size) interpolation-weight matrix for one axis."""
    n = start.shape[0]
    ph = jnp.arange(out_size, dtype=start.dtype)  # (out,)
    iy = jnp.arange(max_samples, dtype=start.dtype)  # (S,)

    grid_f = grid_n.astype(start.dtype)[:, None, None]  # (N,1,1)
    # count = max(grid, 1): degenerate ROIs (grid 0) produce all-zero weights,
    # matching torchvision's `count = max(grid_h * grid_w, 1)` guard.
    grid_div = jnp.maximum(grid_f, 1.0)
    # Sample position: start + ph*bin + bin*(iy+0.5)/grid
    pos = (
        start[:, None, None]
        + ph[None, :, None] * bin_size[:, None, None]
        + bin_size[:, None, None] * (iy[None, None, :] + 0.5) / grid_div
    )  # (N, out, S)
    valid = (iy[None, None, :] < grid_f) & jnp.isfinite(pos)

    # torchvision bilinear_interpolate pre-processing:
    outside = (pos < -1.0) | (pos > size)
    p = jnp.clip(pos, 0.0, None)
    low = jnp.floor(p).astype(jnp.int32)
    at_edge = low >= size - 1
    low = jnp.where(at_edge, size - 1, low)
    p = jnp.where(at_edge, low.astype(p.dtype), p)
    high = jnp.clip(low + 1, 0, size - 1)
    frac = p - low.astype(p.dtype)

    w = jnp.where(valid & ~outside, 1.0, 0.0) / grid_div  # averaged over grid
    w_low = w * (1.0 - frac)
    w_high = w * frac

    # Accumulate into the (N, out, size) matrix via one-hot contractions:
    # TPU scatter-add serializes (and vmapping it over a detection batch made
    # it the object scorer's bottleneck), while the compare+reduce below is
    # pure VPU work. ``size`` is a feature-map axis (small), so the extra
    # (N, out, S, size) intermediate is tiny.
    cols = jnp.arange(size, dtype=jnp.int32)
    onehot_low = (low[..., None] == cols).astype(start.dtype)
    onehot_high = (high[..., None] == cols).astype(start.dtype)
    return (
        jnp.einsum("nos,nosz->noz", w_low, onehot_low)
        + jnp.einsum("nos,nosz->noz", w_high, onehot_high)
    )


@partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "aligned", "max_samples"),
)
def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size,
    spatial_scale: float = 1.0,
    sampling_ratio: int = -1,
    aligned: bool = True,
    max_samples: int = 16,
) -> jnp.ndarray:
    """ROIAlign over one feature map.

    Args:
        features: (C, H, W) or (1, C, H, W) feature map (the reference always
            passes batch-1 maps).
        boxes: (N, 4) ROIs in image coordinates, xyxy.
        output_size: int or (out_h, out_w).
        spatial_scale: feature-map/image scale factor.
        sampling_ratio: points per bin per axis; -1 = adaptive ceil(bin size),
            capped at ``max_samples``.
        aligned: half-pixel alignment (torchvision aligned=True).
        max_samples: static cap for the adaptive grid.

    Returns:
        (N, C, out_h, out_w) pooled features.
    """
    if features.ndim == 4:
        assert features.shape[0] == 1, "roi_align expects a single feature map"
        features = features[0]
    c, h, w = features.shape
    if isinstance(output_size, int):
        out_h = out_w = output_size
    else:
        out_h, out_w = output_size

    # Interpolation positions/weights are ALWAYS built in f32: in bf16 a
    # 256px coordinate quantizes to ~1px and the bilinear fractions lose
    # most of their mantissa. Only the final matmul against the feature map
    # runs in the feature dtype (bf16 on the production path — one MXU pass
    # with f32 accumulation instead of HIGHEST's multi-pass emulation).
    boxes = boxes.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * spatial_scale - offset
    y1 = boxes[:, 1] * spatial_scale - offset
    x2 = boxes[:, 2] * spatial_scale - offset
    y2 = boxes[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out_w
    bin_h = roi_h / out_h

    if sampling_ratio > 0:
        grid_h = jnp.full(boxes.shape[:1], sampling_ratio, jnp.int32)
        grid_w = grid_h
        cap = sampling_ratio
    else:
        grid_h = jnp.clip(jnp.ceil(roi_h / out_h).astype(jnp.int32), 0, max_samples)
        grid_w = jnp.clip(jnp.ceil(roi_w / out_w).astype(jnp.int32), 0, max_samples)
        cap = max_samples

    ay = _axis_weights(y1, bin_h, grid_h, out_h, h, cap)  # (N, out_h, H)
    ax = _axis_weights(x1, bin_w, grid_w, out_w, w, cap)  # (N, out_w, W)

    if features.dtype == jnp.bfloat16:
        mm = dict(precision=None, preferred_element_type=jnp.float32)
        ay = ay.astype(jnp.bfloat16)
        ax = ax.astype(jnp.bfloat16)
    else:
        mm = dict(precision=jax.lax.Precision.HIGHEST)
        ay = ay.astype(features.dtype)
        ax = ax.astype(features.dtype)

    # out[n, c, ph, pw] = Ay[n,ph,:] @ F[c,:,:] @ Ax[n,pw,:]^T  — two matmuls.
    tmp = jnp.einsum("nph,chw->ncpw", ay, features, **mm)  # (N, C, out_h, W)
    tmp = tmp.astype(features.dtype)  # keep matmul 2 single-pass on the MXU
    out = jnp.einsum("ncpw,nqw->ncpq", tmp, ax, **mm)  # (N, C, out_h, out_w)
    return out.astype(features.dtype)
