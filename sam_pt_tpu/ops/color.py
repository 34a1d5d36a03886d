"""Color-space conversions in pure JAX (replacing skimage/cv2 on the hot path).

rgb_to_lab replicates skimage.color.rgb2lab (D65, 2° observer), used by the
reference's patch-similarity filtering (sam_pt/modeling/sam_pt.py:645).
rgb_to_gray replicates cv2.cvtColor(..., COLOR_RGB2GRAY) weights, used by the
Shi-Tomasi query sampler (sam_pt/utils/query_points.py:140).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sRGB -> XYZ (D65) matrix, rows = X, Y, Z. Kept as NUMPY so importing this
# module (it is re-exported by sam_pt_tpu.ops) never initializes a jax
# backend — device-side constant creation at import time made every CLI
# import hang/fail when the accelerator tunnel was unavailable.
_RGB2XYZ = np.array(
    # skimage.color.colorconv.xyz_from_rgb verbatim (truncated constants) —
    # the reference's patch filter goes through skimage, so LAB values (and
    # near-threshold similarity decisions) must match ITS matrix, not a
    # higher-precision derivation.
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)

# D65 reference white.
_XN = 0.95047
_YN = 1.00000
_ZN = 1.08883


def _srgb_to_linear(srgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        ((srgb + 0.055) / 1.055) ** 2.4,
    )


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """Convert [..., 3] RGB (uint8 0-255 or float 0-1) to CIE-LAB float32."""
    rgb = jnp.asarray(rgb)
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        rgb = rgb.astype(jnp.float32) / 255.0
    rgb = rgb.astype(jnp.float32)
    linear = _srgb_to_linear(rgb)
    xyz = jnp.einsum("...c,dc->...d", linear, _RGB2XYZ)
    xyz = xyz / jnp.array([_XN, _YN, _ZN], dtype=jnp.float32)

    # skimage xyz2lab thresholds verbatim: eps 0.008856, linear coef 7.787
    # (not the exact (6/29)^3 / (29/3)^3/116 values).
    f = jnp.where(xyz > 0.008856, jnp.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    l = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([l, a, b], axis=-1)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """Convert [..., 3] RGB to grayscale with OpenCV's BT.601 weights."""
    rgb = jnp.asarray(rgb).astype(jnp.float32)
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    return jnp.einsum("...c,c->...", rgb, w)
