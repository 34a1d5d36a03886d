"""CoTracker point tracker: sliding windows, support grids, backward merge.

Reference wrapper semantics (sam_pt/point_tracker/cotracker/tracker.py):
resize the video to interp_shape [384, 512] (:90-92), scale queries, append a
support-point grid every N frames (:98-102), run the windowed model forward,
then run it again on the time-flipped video and merge wherever the forward
pass left zeros (before each point's query frame, `_compute_backward_tracks`
:154-170); visibility = sigmoid > 0.7 (:147); videos shorter than the window
are padded by repeating the last frame (:12-24).

TPU-first: frame encoding runs once for the whole (resized) video; each
sliding window is one jitted program over ALL tracks (static shapes); the
carry between windows is the standard half-window overlap hand-off.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..api import PointTracker
from .model import CoTracker
from ....ops.resize import resize_bilinear
from ....ops.sampling import bilinear_sample
from ....utils.util import jitted_init


def get_points_on_a_grid(grid_size: int, extent_hw) -> np.ndarray:
    """[1, grid_size^2, 2] (x, y) support points, CoTracker v1 semantics:
    a step margin of extent_w // 64 on every side (linspace(step, extent -
    step)); grid_size == 1 returns the image center."""
    h, w = extent_hw
    if grid_size == 1:
        return np.array([[[w / 2.0, h / 2.0]]], np.float32)
    step = w // 64
    ys = np.linspace(step, h - step, grid_size)
    xs = np.linspace(step, w - step, grid_size)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx, gy], axis=-1).reshape(1, -1, 2).astype(np.float32)


class CoTrackerPointTracker(PointTracker):
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        interp_shape=(384, 512),
        visibility_threshold: float = 0.7,
        support_grid_size: int = 2,
        support_grid_every_n_frames: int = 12,
        add_debug_visualisations: bool = False,
        s: int = 8,
        stride: int = 4,
        iters: int = 6,
        encode_chunk: int = 8,
        dtype=jnp.float32,
        params=None,
        allow_random_init: bool = False,
    ):
        self.interp_shape = tuple(interp_shape) if interp_shape else None
        self.visibility_threshold = visibility_threshold
        self.support_grid_size = support_grid_size
        self.support_grid_every_n_frames = support_grid_every_n_frames
        self.iters = iters
        self.encode_chunk = encode_chunk
        self.model = CoTracker(s=s, stride=stride, dtype=dtype)
        self.s = s
        self.stride = stride

        if params is None and checkpoint_path is not None:
            import os

            if os.path.exists(checkpoint_path):
                from ....utils.checkpoint import load_cotracker_checkpoint

                params = load_cotracker_checkpoint(checkpoint_path)
            elif not allow_random_init:
                raise FileNotFoundError(
                    f"CoTracker checkpoint not found: {checkpoint_path} "
                    "(set allow_random_init: true to run without weights)"
                )
        self.params = params

        # interp_shape resize fused INSIDE the jitted encode: out-of-jit it
        # re-uploaded the f32 resize matrices per video and round-tripped the
        # whole video through f32 HBM layout copies before the CNN (same
        # lesson as SamPredictor._encode; target_hw=None skips the resize).
        def _encode_fn(p, rgbs, target_hw):
            x = rgbs.astype(jnp.float32)
            if target_hw is not None and tuple(target_hw) != x.shape[1:3]:
                x = resize_bilinear(x, target_hw)
            return self.model.apply(p, x, method=CoTracker.encode_frames)

        self._encode = jax.jit(_encode_fn, static_argnums=(2,))

    def init_params(self, key, height: int = 64, width: int = 64,
                    n_points: int = 4):
        h8, w8 = height // self.stride, width // self.stride
        fmaps = jnp.zeros((self.s, h8, w8, self.model.latent_dim))
        coords = jnp.zeros((self.s, n_points, 2))
        feats = jnp.zeros((n_points, self.model.latent_dim))
        tm = jnp.ones((self.s, n_points))
        rgbs = jnp.zeros((1, height, width, 3))

        def _init_all(mod, rgbs, fmaps, coords, feats, tm):
            mod.encode_frames(rgbs)
            return mod(fmaps, coords, feats, tm, iters=1)

        self.params = jitted_init(
            self.model, key, rgbs, fmaps, coords, feats, tm, method=_init_all
        )
        return self.params

    # ------------------------------------------------------------------
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

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _track_jit(self, params, fmaps, queries, t):
        """Exact v1 `CoTracker.forward` semantics, reformulated as one
        static-shape `lax.scan` over window starts:

        - windows start at 0, S/2, ... while start < t - S/2; the last
          window may overrun the video and reads repeat the final frame
          (v1 pads rgbs_seq by repeating the last frame);
        - per window, only tracks with q_t < start + S participate (v1 runs
          the sorted active prefix); inactive tracks are masked out of the
          space attention and their writes are discarded;
        - carried tracks initialize coords/vis from the previous window's
          predictions (first half) and its last frame (second half); their
          flag channel is the EVOLVED track mask (v1 zeroes rows
          [0, prev_start + S) after each window, so carried flags are
          1 exactly on the window's second half); fresh tracks use query
          coords, flag rows (frame >= q_t) and vis flag 10;
        - overrun pad rows get flag 0 (v1's forward_iteration zero-pads a
          short track_mask) and never write;
        - pre-query frames inside a track's first window KEEP the model's
          backward-in-window predictions (v1 writes the whole window);
          frames before that window stay exactly 0 so the wrapper's
          backward pass (mask = traj == 0) fills precisely them.

        Returns traj [t, N, 2] in interp-scale pixels and vis [t, N]
        sigmoid probabilities (unwritten entries: traj 0, vis 0.5, as v1).
        """
        s = self.s
        n = queries.shape[0]

        q_t = queries[:, 0].astype(jnp.int32)
        q_xy_grid = queries[:, 1:] / self.stride

        feats = jax.vmap(
            lambda fm, p: bilinear_sample(fm, p[0], p[1], pad_mode="clamp")
        )(fmaps[q_t], q_xy_grid)  # [N, C]

        track_mask = (
            jnp.arange(t)[:, None] >= q_t[None, :]
        ).astype(jnp.float32)

        assert t >= s, "videos shorter than the window are pre-padded"
        starts = jnp.asarray(list(range(0, t - s // 2, s // 2)), jnp.int32)

        # traj in feature-grid units and vis as RAW LOGITS, scratch-padded
        # by one window so the overrunning tail window's
        # dynamic_update_slice lands in discarded rows
        traj0 = jnp.zeros((t + s, n, 2), jnp.float32)
        vis0 = jnp.zeros((t + s, n), jnp.float32)
        prev0 = jnp.int32(-(t + s))  # "no previous window": everything fresh

        def step(state, ind):
            traj, vis, prev_ind = state
            raw = ind + jnp.arange(s)
            frames = jnp.minimum(raw, t - 1)  # read-clamp = v1's repeat-pad
            real = (raw < t).astype(jnp.float32)
            active = q_t < ind + s
            fresh = (q_t >= prev_ind + s)[None, :]

            tm = jnp.where(
                fresh,
                track_mask[frames],
                (raw >= ind + s // 2).astype(jnp.float32)[:, None],
            ) * real[:, None]

            init_idx = jnp.clip(jnp.minimum(frames, prev_ind + s - 1), 0,
                                t - 1)
            coords_init = jnp.where(
                fresh[..., None], q_xy_grid[None], traj[init_idx]
            )
            vis_init = jnp.where(fresh, 10.0, vis[init_idx])
            coords_w, vis_w, _ = self.model.apply(
                params, fmaps[frames], coords_init, feats, tm,
                iters=self.iters, vis_init=vis_init, active=active,
            )
            write = (real[:, None] * active[None, :].astype(jnp.float32)) > 0
            old_t = jax.lax.dynamic_slice_in_dim(traj, ind, s)
            old_v = jax.lax.dynamic_slice_in_dim(vis, ind, s)
            traj = jax.lax.dynamic_update_slice_in_dim(
                traj, jnp.where(write[..., None], coords_w, old_t), ind, 0
            )
            vis = jax.lax.dynamic_update_slice_in_dim(
                vis, jnp.where(write, vis_w, old_v), ind, 0
            )
            return (traj, vis, ind), None

        (traj, vis, _), _ = jax.lax.scan(step, (traj0, vis0, prev0), starts)

        traj = traj[:t] * self.stride
        vis = jax.nn.sigmoid(vis[:t])
        return traj, vis

    def forward(self, rgbs, query_points: np.ndarray):
        traj, vis = self.forward_device(rgbs, query_points)
        return np.asarray(traj), np.asarray(vis)

    def forward_device(self, rgbs, query_points: np.ndarray):
        """Like `forward` but returns DEVICE arrays without blocking: the
        whole forward+backward merge runs as dispatched device ops, so the
        orchestrator can build SAM prompts on device and never wait for
        tracker results on the host (the tracker download was the single
        biggest host stall in the pipelined eval loop)."""
        assert rgbs.shape[0] == 1, "CoTracker runs per-video"
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))
        from ..api import as_device_video

        video = as_device_video(rgbs)  # uint8 on device, uploaded once
        qp = np.asarray(query_points, np.float32)[0]
        t, h, w, _ = video.shape
        n_points = qp.shape[0]

        ih, iw = self.interp_shape or (h, w)
        if (ih, iw) != (h, w):
            # The video itself is resized INSIDE the jitted per-chunk encode
            # (_encode_video target_hw); only the queries scale here.
            qp = qp.copy()
            qp[:, 1] *= iw / w
            qp[:, 2] *= ih / h

        # pad short videos by repeating the last frame (reference :12-24)
        t_orig = t
        if t < self.s:
            video = jnp.concatenate(
                [video, jnp.repeat(video[-1:], self.s - t, axis=0)], axis=0
            )
            t = self.s

        queries = qp
        if self.support_grid_size > 0:
            extra = []
            for i in range(0, t_orig, self.support_grid_every_n_frames):
                grid = get_points_on_a_grid(self.support_grid_size, (ih, iw))[0]
                extra.append(
                    np.concatenate(
                        [np.full((len(grid), 1), float(i)), grid], axis=1
                    )
                )
            queries = np.concatenate([qp] + extra, axis=0).astype(np.float32)

        # encode once; the backward pass reuses the flipped feature maps
        # (the reference re-encodes the flipped video, tracker.py:155-161).
        # One-slot per-video cache: the orchestrator calls per MASK BATCH
        # with the identical video object, so key on its identity (plus the
        # params object — reloading weights must invalidate the features)
        # and skip the CNN encoder on repeat calls.
        cache = getattr(self, "_fmap_cache", None)
        ckey = (video.shape, (ih, iw))
        if (cache is not None and cache[0] is rgbs
                and cache[1] == ckey and cache[2] is self.params):
            fmaps = cache[3]
        else:
            fmaps = self._encode_video(video, (ih, iw))
            self._fmap_cache = (rgbs, ckey, self.params, fmaps)
        traj_f, vis_f = self._track_jit(
            self.params, fmaps, jnp.asarray(queries), t)

        # backward pass on the flipped features; fill exact zeros from it.
        # The reference flips the ORIGINAL video and its wrapper re-pads the
        # flipped one, so for short videos the repeat-pad frames must come
        # from original frame 0, not sit at the front of the flipped stack.
        queries_b = queries.copy()
        queries_b[:, 0] = t_orig - queries_b[:, 0] - 1
        if t_orig < t:
            fmaps_b = jnp.concatenate(
                [fmaps[:t_orig][::-1],
                 jnp.repeat(fmaps[:1], t - t_orig, axis=0)], axis=0
            )
        else:
            fmaps_b = fmaps[::-1]
        traj_b, vis_b = self._track_jit(
            self.params, fmaps_b, jnp.asarray(queries_b), t)
        traj_b = traj_b[:t_orig][::-1]
        vis_b = vis_b[:t_orig][::-1]

        traj_f = traj_f[:t_orig]
        vis_f = vis_f[:t_orig]
        zero = traj_f == 0
        traj = jnp.where(zero, traj_b, traj_f)
        vis = jnp.where(zero[..., 0], vis_b, vis_f)

        traj = traj[:, :n_points]
        vis = vis[:, :n_points]
        vis = (vis > self.visibility_threshold).astype(jnp.float32)
        traj = traj * jnp.asarray([w / float(iw), h / float(ih)], jnp.float32)
        return traj[None], vis[None]
