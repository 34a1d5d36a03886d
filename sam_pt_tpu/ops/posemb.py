"""Sinusoidal positional embeddings (PIPS / PIPS++ conventions).

These must match the reference bit-for-bit because converted PIPS checkpoints
expect their exact feature layout:
  - get_3d_sincos_embedding == reference utils/misc.py:30 `get_3d_embedding`
  - posemb_sincos_2d_xy    == reference utils/misc.py:10 `posemb_sincos_2d_xy`
"""
from __future__ import annotations

import jax.numpy as jnp


def get_3d_sincos_embedding(
    xyz: jnp.ndarray, num_channels: int, cat_coords: bool = True
) -> jnp.ndarray:
    """PIPS flow sincos embedding for [B, N, 3] (dx, dy, t) vectors.

    Feature layout (reference misc.py:37-54): frequencies
    f_k = 2k * (1000 / C) for k in [0, C/2); per coordinate v the C features
    interleave slot 2k = sin(v * f_k), slot 2k+1 = cos(v * f_k); the three
    per-coordinate blocks concatenate as [emb_x, emb_y, emb_z] and, if
    cat_coords, the raw (x, y, z) are appended at the END.
    Returns [B, N, 3 * C (+3)].
    """
    b, n, d = xyz.shape
    assert d == 3
    c = num_channels
    div_term = (
        jnp.arange(0, c, 2, dtype=jnp.float32) * (1000.0 / c)
    ).reshape(1, 1, c // 2)

    def emb(v):  # v: [B, N, 1] -> [B, N, C] interleaved sin/cos
        ang = v * div_term
        s = jnp.sin(ang)[..., None]  # [B, N, C/2, 1]
        co = jnp.cos(ang)[..., None]
        return jnp.concatenate([s, co], axis=-1).reshape(b, n, c)

    pe = jnp.concatenate(
        [emb(xyz[..., 0:1]), emb(xyz[..., 1:2]), emb(xyz[..., 2:3])], axis=-1
    )
    if cat_coords:
        pe = jnp.concatenate([pe, xyz], axis=-1)
    return pe


def posemb_sincos_2d_xy(
    xy: jnp.ndarray, num_channels: int, temperature: float = 10000.0,
    cat_coords: bool = False,
) -> jnp.ndarray:
    """PIPS++ 2D sincos embedding for [B, S, 2] coords.

    Layout (reference misc.py:10-27): omega_k = 1 / T^(k / (C/4 - 1)) for
    k in [0, C/4); features = [sin(x*w), cos(x*w), sin(y*w), cos(y*w)]
    concatenated blockwise; raw (x, y) appended at the end if cat_coords.
    Returns [B, S, C (+2)].
    """
    b, s, d = xy.shape
    assert d == 2
    c = num_channels
    assert c % 4 == 0, "feature dimension must be multiple of 4 for sincos emb"
    omega = jnp.arange(c // 4, dtype=jnp.float32) / (c // 4 - 1)
    omega = 1.0 / (temperature ** omega)

    x = xy[..., 0:1] * omega  # [B, S, C/4]
    y = xy[..., 1:2] * omega
    pe = jnp.concatenate(
        [jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=-1
    )
    if cat_coords:
        pe = jnp.concatenate([pe, xy], axis=-1)
    return pe


def get_1d_sincos_embedding(
    x: jnp.ndarray, dim: int, temperature: float = 10000.0
) -> jnp.ndarray:
    """Generic [..., ] -> [..., dim] transformer sincos embedding."""
    half = dim // 2
    freqs = jnp.arange(half, dtype=jnp.float32)
    inv = 1.0 / (temperature ** (freqs / half))
    ang = x[..., None] * inv
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def get_2d_sincos_embedding(
    xy: jnp.ndarray, num_channels: int, cat_coords: bool = True
) -> jnp.ndarray:
    """Per-coordinate interleaved sin/cos embedding for [..., 2] coords.

    Same frequency ladder as get_3d_sincos_embedding (f_k = 2k * 1000 / C),
    raw coords then blocks [emb_x, emb_y] — the flow embedding used by
    CoTracker-style trackers. NOTE: unlike PIPS's in-repo get_3d_embedding
    (which APPENDS xyz, misc.py:52-54), CoTracker v1's own get_2d_embedding
    PREPENDS xy (cat([xy, pe])); the converted checkpoint's input_transform
    rows are laid out for the prepended order.
    """
    c = num_channels
    div_term = (
        jnp.arange(0, c, 2, dtype=jnp.float32) * (1000.0 / c)
    ).reshape((1,) * (xy.ndim - 1) + (c // 2,))

    def emb(v):
        ang = v * div_term
        s = jnp.sin(ang)[..., None]
        co = jnp.cos(ang)[..., None]
        return jnp.concatenate([s, co], axis=-1).reshape(*v.shape[:-1], c)

    pe = jnp.concatenate([emb(xy[..., 0:1]), emb(xy[..., 1:2])], axis=-1)
    if cat_coords:
        pe = jnp.concatenate([xy, pe], axis=-1)
    return pe


def sincos_pos_embed_2d_grid(embed_dim: int, grid_hw) -> jnp.ndarray:
    """MAE-style 2D sincos positional embedding table [H, W, embed_dim].

    FIRST half of the channels encodes x, second half y (MAE's
    get_2d_sincos_pos_embed builds grid = meshgrid(grid_w, grid_h), so
    grid[0] — the x mesh — feeds the first half); each half is [sin, cos]
    over omega_k = 1 / 10000^(k / (d/4)). CoTracker v1's sample_pos_embed
    consumes exactly this layout.
    """
    h, w = grid_hw
    d_half = embed_dim // 2
    d_quart = d_half // 2
    omega = 1.0 / (10000.0 ** (jnp.arange(d_quart, dtype=jnp.float32) / d_quart))

    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * omega  # [H, d/4]
    xs = jnp.arange(w, dtype=jnp.float32)[:, None] * omega  # [W, d/4]
    emb_y = jnp.concatenate([jnp.sin(ys), jnp.cos(ys)], axis=-1)  # [H, d/2]
    emb_x = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], axis=-1)  # [W, d/2]
    out = jnp.concatenate(
        [
            jnp.broadcast_to(emb_x[None, :, :], (h, w, d_half)),
            jnp.broadcast_to(emb_y[:, None, :], (h, w, d_half)),
        ],
        axis=-1,
    )
    return out
