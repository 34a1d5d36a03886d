"""TAPIR point tracker wrapper.

Reference semantics (sam_pt/point_tracker/tapir/tracker.py): resize the video
to 256x256 (:76-94), convert (t, x, y) queries to scaled (t, y, x), run the
jitted model with queries chunked to bound cost-volume memory (:58,
query_chunk_size 64), visibility = (1 - sigmoid(occlusion)) *
(1 - sigmoid(expected_dist)) > visibility_threshold (:103-104, 0.1), rescale
trajectories back.

Fixes the reference's noted inefficiency of re-creating the jitted function
on every call (tracker.py:97 — flagged in SURVEY.md §2.3): the jit is built
once in the constructor.
"""
from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..api import PointTracker
from .model import TAPIR, TRAIN_SIZE
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


class TapirPointTracker(PointTracker):
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        visibility_threshold: float = 0.1,
        query_chunk_size: int = 64,
        dtype=jnp.float32,
        params=None,
        allow_random_init: bool = False,
        time_parallel: bool = False,
        mesh=None,
    ):
        self.visibility_threshold = visibility_threshold
        self.query_chunk_size = query_chunk_size
        self.model = TAPIR(dtype=dtype)
        # Ring-style temporal sharding (parallel/temporal.py): one video's
        # frames shard over the mesh 'data' axis; the refinement's time
        # convs run over ring halos. Numerically identical to unsharded.
        self.time_parallel = time_parallel
        self.mesh = mesh
        if time_parallel and mesh is None:
            from ....parallel.mesh import create_mesh

            self.mesh = create_mesh()

        if params is None and checkpoint_path is not None:
            import os

            if os.path.exists(checkpoint_path):
                from ....utils.checkpoint import load_tapir_checkpoint

                params = load_tapir_checkpoint(checkpoint_path)
            elif not allow_random_init:
                raise FileNotFoundError(
                    f"TAPIR checkpoint not found: {checkpoint_path}"
                )
        self.params = params

        # jit once (the reference re-jits per call — tracker.py:97)
        if self.time_parallel:
            from ....parallel.temporal import tapir_forward_time_sharded

            self._forward_jit = (
                lambda p, video, qp: tapir_forward_time_sharded(
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
        assert rgbs.shape[0] == 1, "TAPIR runs per-video"
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))
        from ..api import as_device_video

        video = as_device_video(rgbs)  # [T, H, W, 3] uint8 on device
        qp = np.asarray(query_points, np.float32)[0]
        t, h, w, _ = video.shape
        n = qp.shape[0]

        # resize + normalization stay on device: the video uploads once as
        # uint8 (4x less wire traffic than float32) and never round-trips
        # back to the host
        # antialias: the reference downsamples with antialias=True
        # (tapir/tracker.py:86-87) — a triangle filter, not plain
        # bilinear; matters for parity at 480p -> 256
        frames_dev = _resize_norm_dev(video, TRAIN_SIZE)

        # (t, x, y) -> scaled (t, y, x) in 256-raster coords
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
        expd = np.zeros((n, t), np.float32)
        for i in range(0, n, cs):
            chunk = q_tyx[i : i + cs]
            pad = cs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            out = self._forward_jit(self.params, frames_dev, jnp.asarray(chunk))
            nb = cs - pad
            tracks[i : i + nb] = np.asarray(out["tracks"])[:nb]
            occ[i : i + nb] = np.asarray(out["occlusion"])[:nb]
            expd[i : i + nb] = np.asarray(out["expected_dist"])[:nb]

        # visibility = (1 - sigmoid(occ)) * (1 - sigmoid(expd)) > threshold
        visibles = (
            (1 - 1 / (1 + np.exp(-occ))) * (1 - 1 / (1 + np.exp(-expd)))
            > self.visibility_threshold
        )

        tracks[..., 0] *= w / TRAIN_SIZE[1]
        tracks[..., 1] *= h / TRAIN_SIZE[0]

        trajectories = tracks.transpose(1, 0, 2)  # [T, N, 2]
        visibilities = visibles.T.astype(np.float32)
        return trajectories[None], visibilities[None]


class OnlineTapirPointTracker:
    """Streaming TAPIR: frame-at-a-time tracking with causal-conv context.

    Mirrors the reference's online mode (tapir_model.py:773-819, the
    `causal_tapir_checkpoint` flow): query features are extracted once from
    the query frame; each `track_frame` call refines the new frame with the
    carried per-block depthwise-conv state. Used for interactive streaming
    (BASELINE.json config[4]).
    """

    def __init__(self, checkpoint_path=None, visibility_threshold: float = 0.1,
                 dtype=jnp.float32, params=None, allow_random_init: bool = False):
        self.visibility_threshold = visibility_threshold
        self.model = TAPIR(use_causal_conv=True, dtype=dtype)
        if params is None and checkpoint_path is not None:
            import os

            if os.path.exists(checkpoint_path):
                from ....utils.checkpoint import load_tapir_checkpoint

                params = load_tapir_checkpoint(checkpoint_path)
            elif not allow_random_init:
                raise FileNotFoundError(checkpoint_path)
        self.params = params
        self._state = None
        self._queries = None
        self._hw = None

        self._qf_jit = jax.jit(
            lambda p, f, q: self.model.apply(
                p, f, q, method=TAPIR.get_query_features_online)
        )
        self._step_jit = jax.jit(
            lambda p, f, qh, ql, st: self.model.apply(
                p, f, qh, ql, st, None, method=TAPIR.online_step)
        )

    def _prep(self, frame: np.ndarray) -> jnp.ndarray:
        h, w = frame.shape[:2]
        self._hw = (h, w)
        # reference tapir/tracker.py:86-87 (antialias inside the helper)
        return _resize_norm_dev(jnp.asarray(frame)[None], TRAIN_SIZE)

    def init_tracking(self, frame: np.ndarray, query_xy: np.ndarray) -> None:
        """frame [H, W, 3] uint8; query_xy [N, 2] (x, y) pixel coords."""
        if self.params is None:
            video = jnp.zeros((1, TRAIN_SIZE[0], TRAIN_SIZE[1], 3))
            qp = jnp.zeros((len(query_xy), 3))
            self.params = jitted_init(self.model, jax.random.PRNGKey(0), video, qp)
        h, w = frame.shape[:2]
        q_tyx = np.stack(
            [np.zeros(len(query_xy)),
             query_xy[:, 1] * (TRAIN_SIZE[0] / h),
             query_xy[:, 0] * (TRAIN_SIZE[1] / w)], axis=-1
        ).astype(np.float32)
        f = self._prep(frame)
        self._queries = self._qf_jit(self.params, f, jnp.asarray(q_tyx))
        self._state = None

    def track_frame(self, frame: np.ndarray):
        """Returns (positions [N, 2] (x, y) pixels, visible [N] bool)."""
        assert self._queries is not None, "call init_tracking first"
        f = self._prep(frame)
        q_hi, q_lo = self._queries
        out, self._state = self._step_jit(self.params, f, q_hi, q_lo,
                                          self._state)
        tracks = np.asarray(out["tracks"])[:, 0]  # [N, 2] xy in 256-raster
        occ = np.asarray(out["occlusion"])[:, 0]
        expd = np.asarray(out["expected_dist"])[:, 0]
        h, w = self._hw
        tracks = tracks * np.array(
            [w / TRAIN_SIZE[1], h / TRAIN_SIZE[0]], np.float32
        )
        visible = (
            (1 - 1 / (1 + np.exp(-occ))) * (1 - 1 / (1 + np.exp(-expd)))
            > self.visibility_threshold
        )
        return tracks, visible
