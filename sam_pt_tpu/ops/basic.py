"""Basic array utilities (reference sam_pt/point_tracker/utils/basic.py
equivalents): meshgrids, masked reductions, 2D argmax, gaussian blur.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def meshgrid2d(h: int, w: int, stack_dim: int = -1) -> jnp.ndarray:
    """(y, x) meshgrid as float32 [h, w, 2] (reference basic.py:202-311)."""
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([gy, gx], axis=stack_dim)


def reduce_masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None,
                       keepdims: bool = False, eps: float = 1e-10):
    """Mean of x over elements where mask > 0 (reference basic.py:127-181)."""
    prod = x * mask
    numer = jnp.sum(prod, axis=axis, keepdims=keepdims)
    denom = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return numer / (eps + denom)


def reduce_masked_median(x: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Median over masked elements per row (host-side, reference semantics)."""
    out = np.zeros(x.shape[0], x.dtype)
    for i in range(x.shape[0]):
        vals = x[i][mask[i] > 0]
        out[i] = np.median(vals) if len(vals) else 0.0
    return out


def argmax2d(x: jnp.ndarray, hard: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(y, x) of the maximum of [..., H, W] (reference basic.py:84-126)."""
    h, w = x.shape[-2:]
    flat = x.reshape(*x.shape[:-2], h * w)
    idx = jnp.argmax(flat, axis=-1)
    return (idx // w).astype(jnp.float32), (idx % w).astype(jnp.float32)


def gaussian_kernel_1d(size: int, sigma: float) -> jnp.ndarray:
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (ax / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(x: jnp.ndarray, kernel_size: int, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur of [..., H, W, C] (reference basic.py:382-414)."""
    k = gaussian_kernel_1d(kernel_size, sigma)
    pad = kernel_size // 2

    def conv_axis(v, axis):
        v = jnp.moveaxis(v, axis, -1)
        vp = jnp.pad(
            v, [(0, 0)] * (v.ndim - 1) + [(pad, pad)], mode="edge"
        )
        out = jnp.zeros_like(v)
        for i in range(kernel_size):
            out = out + k[i] * vp[..., i : i + v.shape[-1]]
        return jnp.moveaxis(out, -1, axis)

    x = conv_axis(x, -3)
    return conv_axis(x, -2)
