"""SuperGlue point "tracker": per-frame keypoint matching against frame 0.

Reference semantics (sam_pt/point_tracker/superglue/tracker.py): STATEFUL —
`set_masks` must be called before `forward` (:63-74, honored by the
orchestrator). For each frame i >= 1, match frame 0 <-> frame i with
SuperPoint + SuperGlue; split matches into in-mask positives and out-of-mask
negatives per mask (:144-152), randomly sample to the per-mask quotas
(np.random.choice with replacement, :154-162), pad shortfalls with (-1, -1)
invisible points (:170-182). Frame 0 carries the query points verbatim.

TPU-first: SuperPoint runs once per frame (batched keypoint extraction with
fixed K + validity masks); matching is one static-shape jitted program per
frame pair; frame-0 keypoints/descriptors are computed once and reused
(the reference caches them too, :118-127).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..api import PointTracker
from .superglue import SuperGlue
from .superpoint import SuperPoint
from ....ops.color import rgb_to_gray
from ....utils.util import jitted_init


class SuperGluePointTracker(PointTracker):
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        superpoint_checkpoint_path: Optional[str] = None,
        positive_points_per_mask: int = 8,
        negative_points_per_mask: int = 1,
        max_keypoints: int = 1024,
        sinkhorn_iterations: int = 100,
        match_threshold: float = 0.2,
        nms_radius: int = 4,
        keypoint_threshold: float = 0.005,
        resize=None,
        dtype=jnp.float32,
        params=None,
        allow_random_init: bool = False,
        seed: int = 72,
    ):
        self.positive_points_per_mask = positive_points_per_mask
        self.negative_points_per_mask = negative_points_per_mask
        self.superpoint = SuperPoint(
            max_keypoints=max_keypoints,
            nms_radius=nms_radius,
            keypoint_threshold=keypoint_threshold,
            dtype=dtype,
        )
        self.superglue = SuperGlue(
            sinkhorn_iterations=sinkhorn_iterations,
            match_threshold=match_threshold,
            dtype=dtype,
        )
        self.masks = None
        self.rng = np.random.default_rng(seed)

        if params is None and checkpoint_path is not None:
            import os

            if os.path.exists(str(checkpoint_path)) and (
                superpoint_checkpoint_path
                and os.path.exists(str(superpoint_checkpoint_path))
            ):
                from ....utils.checkpoint import load_superglue_checkpoint

                params = load_superglue_checkpoint(
                    superpoint_checkpoint_path, checkpoint_path
                )
            elif not allow_random_init:
                raise FileNotFoundError(
                    f"SuperGlue checkpoints not found: {checkpoint_path} / "
                    f"{superpoint_checkpoint_path}"
                )
        self.params = params  # {'superpoint': ..., 'superglue': ...}

        self._detect = jax.jit(
            lambda p, img: self.superpoint.apply(p, img)
        )
        self._match = jax.jit(
            lambda p, data: self.superglue.apply(p, data)
        )

    def set_masks(self, masks: np.ndarray) -> None:
        self.masks = np.asarray(masks)

    def init_params(self, key, height: int = 64, width: int = 64):
        k1, k2 = jax.random.split(key)
        sp = jitted_init(self.superpoint, k1, jnp.zeros((height, width)))
        k = self.superpoint.max_keypoints
        data = {
            "keypoints0": jnp.zeros((k, 2)),
            "keypoints1": jnp.zeros((k, 2)),
            "scores0": jnp.zeros((k,)),
            "scores1": jnp.zeros((k,)),
            "valid0": jnp.ones((k,), bool),
            "valid1": jnp.ones((k,), bool),
            "descriptors0": jnp.zeros((k, 256)),
            "descriptors1": jnp.zeros((k, 256)),
            "image_shape": (height, width),
        }
        sg = jitted_init(self.superglue, k2, data)
        self.params = {"superpoint": sp, "superglue": sg}
        return self.params

    def forward(self, rgbs: np.ndarray, query_points: np.ndarray):
        assert self.masks is not None, (
            "Masks must be set before calling forward() for "
            "SuperGluePointTracker"
        )
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))
        video = np.asarray(rgbs, np.float32)[0]
        qp = np.asarray(query_points, np.float32)[0]
        t, h, w, _ = video.shape
        n_points = qp.shape[0]
        ppm = self.positive_points_per_mask + self.negative_points_per_mask
        n_masks = self.masks.shape[0]
        assert ppm * n_masks == n_points

        gray = np.asarray(rgb_to_gray(jnp.asarray(video))) / 255.0

        det0 = {k: np.asarray(v) for k, v in self._detect(
            self.params["superpoint"], jnp.asarray(gray[0])
        ).items()}

        trajectories = np.zeros((t, n_masks, ppm, 2), np.float32)
        visibilities = np.zeros((t, n_masks, ppm), np.float32)
        trajectories[0] = qp[:, 1:].reshape(n_masks, ppm, 2)

        masks_bool = self.masks > 0.5

        for i in range(1, t):
            det1 = {k: np.asarray(v) for k, v in self._detect(
                self.params["superpoint"], jnp.asarray(gray[i])
            ).items()}
            data = {
                "keypoints0": jnp.asarray(det0["keypoints"]),
                "keypoints1": jnp.asarray(det1["keypoints"]),
                "scores0": jnp.asarray(det0["scores"]),
                "scores1": jnp.asarray(det1["scores"]),
                "valid0": jnp.asarray(det0["valid"]),
                "valid1": jnp.asarray(det1["valid"]),
                "descriptors0": jnp.asarray(det0["descriptors"]),
                "descriptors1": jnp.asarray(det1["descriptors"]),
                "image_shape": (h, w),
            }
            pred = self._match(self.params["superglue"], data)
            matches = np.asarray(pred["matches0"])

            sel = matches > -1
            mk1 = det1["keypoints"][np.clip(matches[sel], 0, None)]

            for mi in range(n_masks):
                mask = masks_bool[mi]
                # membership is tested on the TARGET-frame keypoints
                # (reference tracker.py:145-152 indexes the mask with
                # mkpts1) — not on their frame-0 partners, which may have
                # left/entered the mask footprint as the object moves
                iy1 = np.clip(mk1[:, 1].astype(int), 0, h - 1)
                ix1 = np.clip(mk1[:, 0].astype(int), 0, w - 1)
                inside = mask[iy1, ix1]

                for positive, quota, off in (
                    (True, self.positive_points_per_mask, 0),
                    (False, self.negative_points_per_mask,
                     self.positive_points_per_mask),
                ):
                    pts = mk1[inside] if positive else mk1[~inside]
                    take = min(len(pts), quota)
                    if len(pts) > 0:
                        idx = self.rng.choice(len(pts), size=take)
                        chosen = pts[idx]
                    else:
                        chosen = np.zeros((0, 2), np.float32)
                    out = np.full((quota, 2), -1.0, np.float32)
                    out[: len(chosen)] = chosen
                    trajectories[i, mi, off : off + quota] = out
                    visibilities[i, mi, off : off + quota] = (
                        np.arange(quota) < len(chosen)
                    ).astype(np.float32)

        self.masks = None  # consumed (reference :189)

        trajectories = trajectories.reshape(t, n_points, 2)
        visibilities = visibilities.reshape(t, n_points)
        return trajectories[None], visibilities[None]
