"""TapNet point tracker wrapper.

Reference semantics (sam_pt/point_tracker/tapnet/tracker.py): resize to
256x256, (t, x, y) -> scaled (t, y, x), query chunking (:52, size 16),
visibility = sigmoid(occlusion) < 0.5 i.e. occlusion logit < 0 (threshold
0.5, :38-103), rescale back.
"""
from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..api import PointTracker
from .model import TAPNet, TRAIN_SIZE
from ....ops.resize import resize_bilinear
from ....utils.util import jitted_init


# uint8 video -> TAPIR-normalized f32 frames at TRAIN_SIZE, as ONE jitted
# program: out-of-jit the resize re-uploaded its weight matrices per call
# and dispatched unfused f32 layout copies of the whole video (r5 lesson,
# see SamPredictor._encode).
@functools.partial(jax.jit, static_argnums=(1,))
def _resize_norm_dev(video, target_hw):
    x = resize_bilinear(
        video.astype(jnp.float32), target_hw,
        antialias=True,  # reference uses antialiased resize
    )
    return x / 255.0 * 2.0 - 1.0


class TapNetPointTracker(PointTracker):
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        visibility_threshold: float = 0.5,
        query_chunk_size: int = 16,
        dtype=jnp.float32,
        params=None,
        allow_random_init: bool = False,
        time_parallel: bool = False,
        mesh=None,
    ):
        self.visibility_threshold = visibility_threshold
        self.query_chunk_size = query_chunk_size
        self.model = TAPNet(dtype=dtype)
        # Ring-style temporal sharding (parallel/temporal.py): frames of
        # ONE video sharded over the mesh's 'data' axis — the scale-out
        # path for long videos (numerically identical to unsharded).
        self.time_parallel = time_parallel
        self.mesh = mesh
        if time_parallel and mesh is None:
            from ....parallel.mesh import create_mesh

            self.mesh = create_mesh()

        if params is None and checkpoint_path is not None:
            import os

            if os.path.exists(checkpoint_path):
                from ....utils.checkpoint import load_tapnet_checkpoint

                params = load_tapnet_checkpoint(checkpoint_path)
            elif not allow_random_init:
                raise FileNotFoundError(
                    f"TapNet checkpoint not found: {checkpoint_path}"
                )
        self.params = params

        if self.time_parallel:
            from ....parallel.temporal import tapnet_forward_time_sharded

            self._forward_jit = (
                lambda p, video, qp: tapnet_forward_time_sharded(
                    self.model, p, video, qp, self.mesh
                )
            )
        else:
            self._forward_jit = jax.jit(
                lambda p, video, qp: self.model.apply(p, video, qp)
            )

    def init_params(self, key, t: int = 2, n_points: int = 4):
        video = jnp.zeros((t, TRAIN_SIZE[0], TRAIN_SIZE[1], 3))
        qp = jnp.zeros((n_points, 3))
        self.params = jitted_init(self.model, key, video, qp)
        return self.params

    def forward(self, rgbs: np.ndarray, query_points: np.ndarray):
        assert rgbs.shape[0] == 1, "TapNet runs per-video"
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))
        from ..api import as_device_video

        video = as_device_video(rgbs)  # [T, H, W, 3] uint8 on device
        qp = np.asarray(query_points, np.float32)[0]
        t, h, w, _ = video.shape
        n = qp.shape[0]

        # resize + normalization on device; the video uploads once as uint8
        # reference downsamples with antialias=True (tapnet/tracker.py:80)
        frames_dev = _resize_norm_dev(video, TRAIN_SIZE)

        q_tyx = np.stack(
            [
                qp[:, 0],
                qp[:, 2] * (TRAIN_SIZE[0] / h),
                qp[:, 1] * (TRAIN_SIZE[1] / w),
            ],
            axis=-1,
        ).astype(np.float32)
        cs = min(self.query_chunk_size, n)
        tracks = np.zeros((n, t, 2), np.float32)
        occ = np.zeros((n, t), np.float32)
        for i in range(0, n, cs):
            chunk = q_tyx[i : i + cs]
            pad = cs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            out = self._forward_jit(self.params, frames_dev, jnp.asarray(chunk))
            nb = cs - pad
            tracks[i : i + nb] = np.asarray(out["tracks"])[:nb]
            occ[i : i + nb] = np.asarray(out["occlusion"])[:nb]

        # reference: (1 - sigmoid(occ)) > threshold (tapnet/tracker.py:96-99)
        # — equivalent to sigmoid < threshold ONLY at the default 0.5
        visibles = (1.0 - 1.0 / (1.0 + np.exp(-occ))) > self.visibility_threshold

        tracks[..., 0] *= w / TRAIN_SIZE[1]
        tracks[..., 1] *= h / TRAIN_SIZE[0]
        return tracks.transpose(1, 0, 2)[None], visibles.T.astype(np.float32)[None]
