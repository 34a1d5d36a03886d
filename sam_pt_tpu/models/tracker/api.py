"""Point tracker API.

The central plugin interface of the framework, mirroring the reference
contract (sam_pt/point_tracker/tracker.py:22-45):

  forward(rgbs, query_points) -> (trajectories, visibilities)

    rgbs:          [B, T, H, W, 3] uint8 video frames (NHWC, TPU layout —
                   the reference uses NCHW).
    query_points:  [B, N, 3] float32 (t, x, y).
    trajectories:  [B, T, N, 2] float32 (x, y) per frame.
    visibilities:  [B, T, N] float32; == 1 means visible (see
                   utils.util.PointVisibilityType for the full taxonomy).

Implementations are free to run their heavy lifting as jitted JAX programs;
`forward` takes/returns numpy-compatible arrays at the API boundary.
"""
from __future__ import annotations

import abc
from typing import Optional, Tuple

import numpy as np


class PointTracker(abc.ABC):
    @abc.abstractmethod
    def forward(
        self, rgbs: np.ndarray, query_points: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        ...

    def __call__(self, rgbs, query_points):
        return self.forward(rgbs, query_points)

    def evaluate_batch(
        self,
        rgbs,
        query_points,
        trajectories_gt: Optional[np.ndarray] = None,
        visibilities_gt: Optional[np.ndarray] = None,
    ) -> dict:
        """Run forward and pack results (reference tracker.py:47-84 contract)."""
        trajectories, visibilities = self.forward(rgbs, query_points)
        b, t = rgbs.shape[0], rgbs.shape[1]
        n = query_points.shape[1]
        assert trajectories.shape == (b, t, n, 2), trajectories.shape
        return {
            "trajectories_pred": np.asarray(trajectories),
            "visibilities_pred": np.asarray(visibilities),
            "query_points": np.asarray(query_points),
            "trajectories_gt": None if trajectories_gt is None else np.asarray(trajectories_gt),
            "visibilities_gt": None if visibilities_gt is None else np.asarray(visibilities_gt),
        }

    @classmethod
    def unpack_results(cls, packed: dict, batch_idx: int) -> list:
        """Flatten per-(video, point) results (reference tracker.py:86-118)."""
        out = []
        traj = packed["trajectories_pred"]
        for b in range(traj.shape[0]):
            for n in range(traj.shape[2]):
                row = {
                    "idx": f"{batch_idx}_{b}_{n}",
                    "iter": batch_idx,
                    "video_idx": b,
                    "point_idx_in_video": n,
                    "query_point": packed["query_points"][b, n, :],
                    "trajectory_pred": traj[b, :, n, :],
                    "visibility_pred": packed["visibilities_pred"][b, :, n],
                }
                if packed.get("trajectories_gt") is not None:
                    row["trajectory_gt"] = packed["trajectories_gt"][b, :, n, :]
                    row["visibility_gt"] = packed["visibilities_gt"][b, :, n]
                out.append(row)
        return out


def as_device_video(rgbs) -> "jax.Array":
    """[B, T, H, W, 3] video -> single-video [T, H, W, 3] DEVICE array.

    Trackers accept numpy or already-on-device videos; the input DTYPE is
    preserved (callers pass uint8 — uploading uint8 once and
    casting/resizing on device instead of shuttling float32 frames is a 4x
    saving on the host->device path, which dominates wall-clock on
    low-bandwidth interconnects).
    """
    import jax

    # NOTE: must be an isinstance check — numpy>=2.0 ndarrays also expose a
    # `.device` attribute, and a hasattr test would return the HOST array
    # unchanged, silently defeating the upload-once-as-uint8 path.
    if isinstance(rgbs, jax.Array):
        arr = rgbs
    else:
        # ONE explicit device_put: the jnp.asarray upload path measured
        # ~10x below device_put wire speed on the loaded remote tunnel
        # (scripts/diag_upload.py, r5).
        arr = jax.device_put(np.asarray(rgbs), jax.devices()[0])
    if arr.ndim == 5:
        arr = arr[0]
    return arr
