"""Bilinear / neighborhood sampling primitives, designed TPU-first.

On TPU, scattered gathers are slow while matmuls are nearly free, so wherever a
sampling pattern is *separable* (a regular (dy, dx) grid around a center), we
express it as two small dense matmuls against one-hot/hat weight matrices that
ride the MXU. Irregular point sampling falls back to a flat gather which XLA
lowers to dynamic-slice loops; these are only used for O(points) work, never
O(pixels).

Semantics match the reference implementations they replace (cited per function)
without copying them:
  - pixel-coordinate bilinear sampling with border clamping
    (reference: sam_pt/point_tracker/utils/samp.py:6 `bilinear_sample2d`)
  - grid_sample(align_corners=True, padding='zeros') neighborhood sampling
    (reference: sam_pt/point_tracker/pips/pips.py:320 `bilinear_sampler`)
  - grid_sample(align_corners=False) patch extraction at pixel centers
    (reference: sam_pt/modeling/sam_pt.py:597 `extract_patches_from_points`)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather img[H, W, C] at integer (iy, ix) of shape [...]; returns [..., C]."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h * w, -1)
    idx = iy * w + ix
    return jnp.take(flat, idx, axis=0)


def bilinear_sample(
    img: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    pad_mode: str = "clamp",
) -> jnp.ndarray:
    """Bilinearly sample `img` [H, W, C] at pixel coordinates (x, y) of shape [...].

    pad_mode:
      - "clamp": out-of-range coordinates are clamped to the border
        (matches reference samp.py:6 `bilinear_sample2d` semantics).
      - "zeros": contributions from out-of-range integer taps are zero
        (matches torch grid_sample(padding_mode='zeros') at pixel coords).

    Returns [..., C] float32.
    """
    h, w = img.shape[0], img.shape[1]
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def clip_ix(v):
        return jnp.clip(v.astype(jnp.int32), 0, w - 1)

    def clip_iy(v):
        return jnp.clip(v.astype(jnp.int32), 0, h - 1)

    if pad_mode == "zeros":
        vx0 = (x0 >= 0) & (x0 <= w - 1)
        vx1 = (x1 >= 0) & (x1 <= w - 1)
        vy0 = (y0 >= 0) & (y0 <= h - 1)
        vy1 = (y1 >= 0) & (y1 <= h - 1)
        wx0 = wx0 * vx0
        wx1 = wx1 * vx1
        wy0 = wy0 * vy0
        wy1 = wy1 * vy1

    ix0, ix1 = clip_ix(x0), clip_ix(x1)
    iy0, iy1 = clip_iy(y0), clip_iy(y1)

    v00 = _gather_hw(img, iy0, ix0)
    v01 = _gather_hw(img, iy0, ix1)
    v10 = _gather_hw(img, iy1, ix0)
    v11 = _gather_hw(img, iy1, ix1)

    out = (
        v00 * (wy0 * wx0)[..., None]
        + v01 * (wy0 * wx1)[..., None]
        + v10 * (wy1 * wx0)[..., None]
        + v11 * (wy1 * wx1)[..., None]
    )
    return out


def bilinear_sample_nchw(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Batched pixel-coordinate bilinear sampling, reference-API compatible.

    img: [B, C, H, W]; x, y: [B, N] pixel coords. Returns [B, C, N] with border
    clamping — the contract of reference samp.py:6 `bilinear_sample2d`.
    """
    img_hwc = jnp.transpose(img, (0, 2, 3, 1))
    out = jax.vmap(lambda im, xx, yy: bilinear_sample(im, xx, yy, pad_mode="clamp"))(
        img_hwc, x, y
    )  # [B, N, C]
    return jnp.transpose(out, (0, 2, 1))


def grid_sample_nearest(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample img [H, W, C] at pixel coords; clamped. [..., C]."""
    h, w = img.shape[0], img.shape[1]
    ix = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
    return _gather_hw(img, iy, ix)


def _hat_weights(coords: jnp.ndarray, size: int, zero_pad: bool) -> jnp.ndarray:
    """Dense bilinear 'hat' weight matrix.

    coords: [...] fractional pixel positions along an axis of length `size`.
    Returns [..., size] with w[j] = max(0, 1 - |coord - j|). Rows for in-range
    coords sum to 1; out-of-range coords get partial/zero rows, reproducing
    grid_sample zero padding. If zero_pad=False, coords are clamped to the
    valid range first (border-clamp semantics).
    """
    if not zero_pad:
        coords = jnp.clip(coords, 0.0, float(size - 1))
    j = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - j))


def separable_neighborhood_sample(
    plane: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    dy: jnp.ndarray,
    dx: jnp.ndarray,
    *,
    zero_pad: bool = True,
) -> jnp.ndarray:
    """Sample a regular (dy, dx) neighborhood grid around centers — as matmuls.

    This is the TPU-native replacement for the gather in PIPS CorrBlock.sample
    (reference pips.py:364-391): instead of gathering (2r+1)^2 scattered taps,
    we build per-center hat-weight matrices Wy [Ky, H], Wx [Kx, W] and contract
      out[p, q] = sum_{h, w} Wy[p, h] * plane[h, w] * Wx[q, w]
    which is bilinear interpolation at (cy + dy[p], cx + dx[q]) and runs on the
    MXU. The same trick TAPIR uses for patch extraction ("on TPU, matmul is
    cheap and gather is expensive", reference tapir_model.py:489).

    plane: [..., H, W] (leading batch dims shared with cx/cy)
    cx, cy: [...] centers in pixel coordinates
    dy: [Ky], dx: [Kx] offsets
    Returns [..., Ky, Kx].
    """
    h, w = plane.shape[-2], plane.shape[-1]
    ys = cy[..., None] + dy  # [..., Ky]
    xs = cx[..., None] + dx  # [..., Kx]
    wy = _hat_weights(ys, h, zero_pad)  # [..., Ky, H]
    wx = _hat_weights(xs, w, zero_pad)  # [..., Kx, W]
    # [..., Ky, W] = [..., Ky, H] @ [..., H, W]
    tmp = jnp.einsum("...kh,...hw->...kw", wy, plane)
    return jnp.einsum("...kw,...qw->...kq", tmp, wx)


def patch_sample(
    img: jnp.ndarray,
    points_xy: jnp.ndarray,
    patch_size: int,
) -> jnp.ndarray:
    """Extract square patches centered at pixel coords, bilinear, zero padding.

    Matches the reference patch-similarity feature extraction
    (sam_pt/modeling/sam_pt.py:597-622): template offsets
    arange(-(p//2), p//2 + 1) and grid_sample(align_corners=False) on
    (xy + offset + 0.5) normalized coords — which samples exactly at pixel
    coordinate (xy + offset) with zero padding.

    img: [H, W, C]; points_xy: [N, 2] (x, y).
    Returns [N, K * K, C] where K = 2*(patch_size//2) + 1 — i.e. patch_size
    for odd sizes, patch_size+1 for even ones, mirroring the reference's
    arange-based template (its even-size grid also has p+1 points per side).
    """
    half = patch_size // 2
    offs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = int(offs.shape[0])
    out = separable_neighborhood_sample(
        jnp.transpose(img, (2, 0, 1)),  # [C, H, W]
        points_xy[:, None, 0],  # [N, 1] broadcasting over channel axis
        points_xy[:, None, 1],
        offs,
        offs,
        zero_pad=True,
    )  # [N, C, K, K]
    n = points_xy.shape[0]
    c = img.shape[-1]
    return jnp.transpose(out.reshape(n, c, k * k), (0, 2, 1))
