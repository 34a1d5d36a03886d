"""PIPS++ point tracker: long sliding windows with feature carry-over.

Reference semantics (sam_pt/point_tracker/pips_plus_plus/tracker.py): resize
the video to image_size (512, 896); group query points by timestep; for each
group run single-direction chained windows of `max_sequence_length` frames
with zero-velocity future init and feature carry (:25-65), both left-to-right
from the query frame and right-to-left on the flipped prefix, stitched at the
query frame (:92-117); visibilities are all ones (:64).

Deviation from the reference: query coordinates are scaled with the correct
per-axis factors (x by width ratio, y by height ratio) — the reference swaps
them (tracker.py:78-79), which distorts tracking whenever the aspect ratio
changes.

TPU-first: frames are encoded once per direction; each window runs as one
jitted program over all grouped points.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..api import PointTracker
from .model import PipsPlusPlus
from ....ops.resize import resize_bilinear
from ....utils.util import jitted_init


class PipsPlusPlusPointTracker(PointTracker):
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        stride: int = 8,
        max_sequence_length: int = 128,
        iters: int = 16,
        image_size=(512, 896),
        encode_chunk: int = 8,
        dtype=jnp.float32,
        params=None,
        allow_random_init: bool = False,
    ):
        self.stride = stride
        self.max_sequence_length = max_sequence_length
        self.iters = iters
        self.image_size = tuple(image_size) if image_size is not None else None
        self.encode_chunk = encode_chunk
        self.model = PipsPlusPlus(stride=stride, dtype=dtype)

        if params is None and checkpoint_path is not None:
            import os

            if os.path.exists(checkpoint_path):
                from ....utils.checkpoint import load_pips2_checkpoint

                params = load_pips2_checkpoint(checkpoint_path)
            elif not allow_random_init:
                raise FileNotFoundError(
                    f"PIPS++ checkpoint not found: {checkpoint_path}"
                )
        self.params = params

        # f32 cast + image_size resize fused INSIDE the jitted encode: the
        # out-of-jit version cast the whole video to f32 on the HOST (4x
        # wire traffic) and round-tripped the resize device->host->device
        # (same lesson as CoTrackerPointTracker; target_hw=None skips).
        def _encode_fn(p, rgbs, target_hw):
            x = rgbs.astype(jnp.float32)
            if target_hw is not None and tuple(target_hw) != x.shape[1:3]:
                x = resize_bilinear(x, target_hw)
            return self.model.apply(p, x, method=PipsPlusPlus.encode_frames)

        self._encode = jax.jit(_encode_fn, static_argnums=(2,))
        self._window = jax.jit(
            lambda p, fm, ci, fi: self.model.apply(
                p, fm, ci, fi, iters=self.iters
            )
        )

    def init_params(self, key, height: int = 64, width: int = 64,
                    n_points: int = 4, s: int = 8):
        fmaps = jnp.zeros((s, height // self.stride, width // self.stride,
                           self.model.latent_dim))
        coords = jnp.zeros((s, n_points, 2))
        rgbs = jnp.zeros((1, height, width, 3))

        def _init_all(mod, rgbs, fmaps, coords):
            mod.encode_frames(rgbs)
            return mod(fmaps, coords, None, iters=2)

        self.params = jitted_init(self.model, key, rgbs, fmaps, coords,
                                  method=_init_all)
        return self.params

    def _encode_video(
        self, rgbs: np.ndarray, target_hw=None
    ) -> jnp.ndarray:
        t = rgbs.shape[0]
        out = []
        ec = self.encode_chunk
        for i in range(0, t, ec):
            chunk = jnp.asarray(rgbs[i : i + ec])
            pad = ec - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], pad, axis=0)], 0
                )
            out.append(
                self._encode(self.params, chunk, target_hw)[: ec - pad])
        return jnp.concatenate(out, axis=0)

    def _forward_direction(self, fmaps, query_xy: np.ndarray) -> np.ndarray:
        """Chained windows from frame 0 (where all points start).

        fmaps: [S, H8, W8, C] device; query_xy: [N, 2] pixels.
        Returns trajectories [S, N, 2].
        """
        t = fmaps.shape[0]
        n = query_xy.shape[0]
        msl = min(self.max_sequence_length, t)

        trajs = np.broadcast_to(query_xy[None], (t, n, 2)).copy()
        cur = 0
        feat_init = None
        while True:
            end = cur + msl
            if end > t:
                diff = end - t
                end = t
                cur = max(cur - diff, 0)
            s_local = end - cur
            coords_init = jnp.asarray(trajs[cur:end])
            fm = fmaps[cur:end]
            if feat_init is not None:
                feat_init = tuple(f[:s_local] for f in feat_init)
            coords, feat_init = self._window(
                self.params, fm, coords_init, feat_init
            )
            trajs[cur:end] = np.asarray(coords)
            trajs[end:] = trajs[end - 1 : end]  # zero-velocity future init
            if end >= t:
                break
            cur = cur + msl - 1
        return trajs

    def forward(self, rgbs: np.ndarray, query_points: np.ndarray):
        assert rgbs.shape[0] == 1, "PIPS++ runs per-video"
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))
        from ..api import as_device_video

        video = as_device_video(rgbs)  # uploaded once, native dtype
        qp = np.asarray(query_points, np.float32)[0]
        t, h, w, _ = video.shape
        n = qp.shape[0]

        if self.image_size is not None and (h, w) != self.image_size:
            # the video resize happens INSIDE the jitted per-chunk encode
            ih, iw = self.image_size
            qp = qp.copy()
            qp[:, 1] *= iw / w
            qp[:, 2] *= ih / h
        else:
            ih, iw = h, w

        fmaps = self._encode_video(video, (ih, iw))
        fmaps_flipped = fmaps[::-1]

        groups = defaultdict(list)
        for idx in range(n):
            groups[int(qp[idx, 0])].append(idx)

        trajectories = np.zeros((t, n, 2), np.float32)
        for ts, idxs in groups.items():
            pts = qp[idxs, 1:]
            if ts > 0:
                # the reference merge drops the right pass's value AT the
                # query frame (cat(right[:, :-1], left), tracker.py:116):
                # frame ts belongs to the left pass
                right = self._forward_direction(
                    fmaps_flipped[t - 1 - ts :], pts
                )[::-1]
                trajectories[:ts, idxs] = right[:ts]
            if ts < t - 1:
                left = self._forward_direction(fmaps[ts:], pts)
                trajectories[ts:, idxs] = left
            else:
                # query at the last frame: the reference's merge produces a
                # ragged (t-1)-frame track and crashes downstream; pin the
                # query coords instead (documented deviation)
                trajectories[ts, idxs] = pts

        visibilities = np.ones((t, n), np.float32)

        trajectories = trajectories.copy()
        trajectories[..., 0] *= w / iw
        trajectories[..., 1] *= h / ih
        return trajectories[None], visibilities[None]
