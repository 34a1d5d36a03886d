"""DINO-style label propagation (semi-supervised VOS by feature affinity).

Native port of the reference's vendored PIPS helpers
(/root/reference/sam_pt/point_tracker/utils/test.py:9-120 — themselves from
the DINO/PiPs codebases): frame prep for a DINO ViT, local-attention
neighborhood restriction, top-k affinity label propagation from context
frames, and per-channel mask normalization. All array math is jnp (matmul
-based, no gathers on the hot path) so the propagation jits onto the TPU.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.228, 0.224, 0.225], np.float32)


def prep_frame_for_dino(
    img: np.ndarray, scale_size: Sequence[int] = (192,)
) -> Tuple[np.ndarray, int, int]:
    """RGB uint8 [H, W, 3] -> (normalized CHW float32, ori_h, ori_w).

    Matches the reference prep (test.py:9-39): resize so the SHORT side hits
    scale_size[0] with the long side snapped down to a multiple of 64 (or an
    explicit (th, tw)), scale to [0, 1], RGB->BGR flip, imagenet normalize.
    """
    import cv2

    ori_h, ori_w, _ = img.shape
    if len(scale_size) == 1:
        if ori_h > ori_w:
            tw = scale_size[0]
            th = int(((tw * ori_h) / ori_w) // 64 * 64)
        else:
            th = scale_size[0]
            tw = int(((th * ori_w) / ori_h) // 64 * 64)
    else:
        th, tw = scale_size
    out = cv2.resize(img, (tw, th)).astype(np.float32) / 255.0
    out = out[:, :, ::-1]  # the reference feeds BGR-flipped frames
    out = (out - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(out, (2, 0, 1)).copy(), ori_h, ori_w


def restrict_neighborhood(h: int, w: int, size: int = 12) -> jnp.ndarray:
    """[h*w, h*w] 0/1 mask of query-key pairs within a (2*size+1)^2 window
    (reference restrict_neighborhood :54-70, vectorized)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ys, xs = ys.ravel(), xs.ravel()
    mask = (np.abs(ys[:, None] - ys[None, :]) <= size) & (
        np.abs(xs[:, None] - xs[None, :]) <= size
    )
    return jnp.asarray(mask.astype(np.float32))


def label_propagation(
    h: int,
    w: int,
    feat_tar: jnp.ndarray,
    list_frame_feats: List[jnp.ndarray],
    list_segs: List[jnp.ndarray],
    mask_neighborhood: Optional[jnp.ndarray] = None,
    topk: int = 5,
    temperature: float = 0.1,
    neighborhood_size: int = 12,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Propagate context-frame labels to the target frame by feature affinity.

    feat_tar: [h*w, dim] target features; list_frame_feats: n context frames
    of [dim, h*w]; list_segs: n of [1, C, h, w] label maps. Returns
    ([1, C, h, w] propagated labels, neighborhood mask for reuse) — the
    reference label_propagation contract (test.py:72-107).
    """
    n = len(list_frame_feats)
    feat_sources = jnp.stack(list_frame_feats)  # [n, dim, hw]

    def l2norm(x, axis):
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12
        )

    ft = l2norm(feat_tar, 1)  # [hw, dim]
    fs = l2norm(feat_sources, 1)  # [n, dim, hw]

    aff = jnp.exp(jnp.einsum("qd,ndk->nqk", ft, fs) / temperature)

    if neighborhood_size > 0:
        if mask_neighborhood is None:
            mask_neighborhood = restrict_neighborhood(
                h, w, neighborhood_size
            )
        aff = aff * mask_neighborhood[None]

    # [n*hw_src, hw_tar]: keep top-k source nodes per target, renormalize
    aff = jnp.transpose(aff, (0, 2, 1)).reshape(-1, h * w)
    kth = jnp.sort(aff, axis=0)[-topk][None]  # k-th largest per column
    aff = jnp.where(aff < kth, 0.0, aff)
    aff = aff / jnp.sum(aff, axis=0, keepdims=True)

    segs = jnp.concatenate(list_segs)  # [n, C, h, w]
    c = segs.shape[1]
    segs = segs.reshape(n, c, h * w).transpose(0, 2, 1).reshape(-1, c).T
    seg_tar = segs @ aff  # [C, hw_tar]
    return seg_tar.reshape(1, c, h, w), mask_neighborhood


def norm_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-channel min-max normalize channels with positive max
    (reference norm_mask :110-118)."""
    c = mask.shape[0]
    flat = mask.reshape(c, -1)
    mx = flat.max(axis=1, keepdims=True)
    mn = flat.min(axis=1, keepdims=True)
    normed = (flat - mn) / jnp.maximum(mx - mn, 1e-12)
    out = jnp.where(mx > 0, normed, flat)
    return out.reshape(mask.shape)
