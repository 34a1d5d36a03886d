"""Image resizing as separable weight-matrix matmuls.

A resize along one axis is a dense [out, in] weight matrix applied to that
axis; bilinear, antialiased-bilinear (PIL-style), and nearest resizes differ
only in the weights. Expressing resize this way keeps it on the MXU and lets
XLA fuse it with surrounding ops — no gathers.

Weight conventions replicated (needed for mask/J&F parity with the reference):
  - "half_pixel": torch F.interpolate(mode='bilinear', align_corners=False)
  - "align_corners": torch F.interpolate(..., align_corners=True)
    (used by the reference PIPS encoder upsampling, pips.py:266-278, and the
    correlation-pyramid upsample, pips.py:517)
  - antialias=True: PIL-style triangle filter, matching the torchvision
    PIL-backed resize used by SAM's ResizeLongestSide preprocessing
  - "nearest": torch F.interpolate(mode='nearest') floor convention
    (used by the reference VOS mask resize, vos_eval/data/video_reader.py:121)

All functions take NHWC / HWC arrays (TPU-native layout).
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int, out_size: int, mode: str, antialias: bool
) -> np.ndarray:
    """Dense [out_size, in_size] resize weight matrix (host-computed, cached)."""
    if mode == "nearest":
        scale = in_size / out_size
        src = np.floor(np.arange(out_size) * scale).astype(np.int64)
        src = np.clip(src, 0, in_size - 1)
        w = np.zeros((out_size, in_size), dtype=np.float32)
        w[np.arange(out_size), src] = 1.0
        return w

    j = np.arange(in_size, dtype=np.float64)
    if mode == "align_corners":
        if out_size == 1:
            centers = np.zeros((1,))
        else:
            centers = np.arange(out_size) * (in_size - 1) / (out_size - 1)
        support = 1.0
    elif mode == "half_pixel":
        scale = in_size / out_size
        centers = (np.arange(out_size) + 0.5) * scale - 0.5
        support = max(scale, 1.0) if antialias else 1.0
    else:
        raise ValueError(f"unknown resize mode: {mode}")

    dist = np.abs(j[None, :] - centers[:, None]) / support
    w = np.maximum(0.0, 1.0 - dist)
    # Normalize rows (PIL behaviour; also equals torch's border clamping for
    # the plain bilinear case since clamped taps merge into border weights).
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


def _apply_axis(x: jnp.ndarray, w: np.ndarray, axis: int) -> jnp.ndarray:
    w = jnp.asarray(w)
    x = jnp.moveaxis(x, axis, -1)
    # Resize weights need full f32 accumulation even where the surrounding
    # model runs bf16 (mask-boundary fidelity feeds straight into J&F).
    y = jnp.einsum("...i,oi->...o", x, w, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    *,
    align_corners: bool = False,
    antialias: bool = False,
    h_axis: int = -3,
    w_axis: int = -2,
) -> jnp.ndarray:
    """Bilinear resize of the (H, W) axes of an [..., H, W, C] array."""
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = out_hw
    mode = "align_corners" if align_corners else "half_pixel"
    dtype = x.dtype
    x = x.astype(jnp.float32)
    if in_h != out_h:
        x = _apply_axis(x, _resize_matrix(in_h, out_h, mode, antialias), h_axis)
    if in_w != out_w:
        x = _apply_axis(x, _resize_matrix(in_w, out_w, mode, antialias), w_axis)
    return x.astype(dtype) if jnp.issubdtype(dtype, jnp.floating) else x


def resize_nearest(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    *,
    h_axis: int = -3,
    w_axis: int = -2,
) -> jnp.ndarray:
    """Nearest-neighbor resize (torch floor convention) of (H, W) axes."""
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = out_hw
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    if in_h != out_h:
        x = _apply_axis(x, _resize_matrix(in_h, out_h, "nearest", False), h_axis)
    if in_w != out_w:
        x = _apply_axis(x, _resize_matrix(in_w, out_w, "nearest", False), w_axis)
    return x.astype(orig_dtype)


def get_longest_side_target_hw(h: int, w: int, long_side: int) -> tuple[int, int]:
    """Target (h, w) after scaling so the longest side equals `long_side`.

    Matches SAM's ResizeLongestSide.get_preprocess_shape: scale both sides by
    long_side / max(h, w) and round half up (int(x + 0.5)).
    """
    scale = long_side / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


def resize_longest_side(
    image: jnp.ndarray, long_side: int, *, antialias: bool = True
) -> jnp.ndarray:
    """Resize [H, W, C] so the longest side equals `long_side` (SAM preproc)."""
    h, w = image.shape[0], image.shape[1]
    target = get_longest_side_target_hw(h, w, long_side)
    return resize_bilinear(
        image.astype(jnp.float32), target, align_corners=False, antialias=antialias
    )
