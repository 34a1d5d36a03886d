"""PIPS point tracker: bidirectional chained-window trajectory linking.

Reference semantics (sam_pt/point_tracker/pips/tracker.py): starting at each
point's query frame, run the PIPS window model over S=8 frames, then advance
each point's frontier to the latest window frame whose predicted visibility
clears a threshold that decays by 0.02 whenever no frame clears it
(:112-148); repeat until the video ends; run the same procedure on the
time-reversed video and stitch both directions at the query frame (:155-201).

TPU-first re-design:
  - The BasicEncoder runs ONCE for the whole video (chunk-batched, jitted) —
    the reference re-encodes all 8 window frames on every linking step
    (pips.py:453-455).
  - Window forwards run with ALL N points per call (inactive points are
    masked on the host when writing results), so the jitted program has one
    static shape — no recompilation as the frontier set changes.
  - feat_init is the bilinear sample of the query-frame feature map at the
    query point (what the reference's extra "init" forward pass ultimately
    returns, pips.py:469-474) — computed directly, saving a full forward.
  - Frontier advancement operates on tiny [N] host arrays; device traffic per
    window is [S, N, 2] + [S, N] floats.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..api import PointTracker
from .model import Pips
from ....ops.sampling import bilinear_sample
from ....utils.util import jitted_init


class PipsPointTracker(PointTracker):
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        stride: int = 4,
        s: int = 8,
        initial_next_frame_visibility_threshold: float = 0.9,
        iters: int = 6,
        encode_chunk: int = 8,
        dtype=jnp.float32,
        params=None,
        allow_random_init: bool = False,
    ):
        self.stride = stride
        self.s = s
        self.iters = iters
        self.vis_threshold0 = initial_next_frame_visibility_threshold
        self.encode_chunk = encode_chunk
        self.model = Pips(s=s, stride=stride, dtype=dtype)
        if params is None and checkpoint_path is not None:
            import os
            if os.path.exists(checkpoint_path):
                from ....utils.checkpoint import load_pips_checkpoint

                params = load_pips_checkpoint(checkpoint_path, self.model)
            elif allow_random_init:
                import warnings

                warnings.warn(
                    f"PIPS checkpoint {checkpoint_path!r} not found — "
                    "using RANDOM weights"
                )
            else:
                raise FileNotFoundError(
                    f"PIPS checkpoint not found: {checkpoint_path} "
                    "(set allow_random_init: true to run without weights)"
                )
        self.params = params

        self._encode = jax.jit(
            lambda p, rgbs: self.model.apply(p, rgbs, method=Pips.encode_frames)
        )

    # -- parameter init (tests / benchmarks without a checkpoint) -------
    def init_params(self, key, height: int, width: int, n_points: int = 8):
        fmaps = jnp.zeros(
            (self.s, height // self.stride, width // self.stride,
             self.model.latent_dim)
        )
        xys = jnp.zeros((n_points, 2))
        rgbs = jnp.zeros((1, height, width, 3))

        def _init_all(mod, rgbs, fmaps, xys):
            mod.encode_frames(rgbs)  # create fnet params too
            return mod(fmaps, xys, iters=1)

        self.params = jitted_init(self.model, key, rgbs, fmaps, xys,
                                  method=_init_all)
        return self.params

    # -- main API -------------------------------------------------------
    def encode_video(self, rgbs: np.ndarray) -> jnp.ndarray:
        """rgbs [T, H, W, 3] -> fmaps [T, H/stride, W/stride, C], chunked."""
        t = rgbs.shape[0]
        chunks = []
        for i in range(0, t, self.encode_chunk):
            chunk = jnp.asarray(rgbs[i : i + self.encode_chunk])
            pad = self.encode_chunk - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], pad, axis=0)], axis=0
                )
            out = self._encode(self.params, chunk)
            chunks.append(out[: self.encode_chunk - pad])
        return jnp.concatenate(chunks, axis=0)

    def _forward_direction(
        self, fmaps: jnp.ndarray, query_points: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Chained-window linking in one temporal direction — fully on device.

        The entire data-dependent linking loop (reference pips/tracker.py:
        61-148) runs as ONE jitted `lax.while_loop`: each iteration gathers
        the current 8-frame feature window, runs the window model for all N
        points (skipped via `lax.cond` when no point's frontier is at the
        current frame), scatters results into the trajectory state, and
        advances each point's frontier with the decaying-visibility inner
        loop. One host round trip per direction instead of one per frame.

        fmaps: [T, H8, W8, C] (device); query_points: [N, 3] (t, x, y) host.
        Returns host (trajectories [T, N, 2], visibilities [T, N] float).
        """
        t = int(fmaps.shape[0])
        qp = jnp.asarray(query_points, jnp.float32)
        traj, vis = self._linked_direction_jit(
            self.params, fmaps, qp, t
        )
        return np.asarray(traj), np.asarray(vis)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _linked_direction_jit(self, params, fmaps, query_points, t):
        s = self.s
        n = query_points.shape[0]
        latent = self.model.latent_dim

        start_frames = query_points[:, 0].astype(jnp.int32)
        q_xy = query_points[:, 1:]

        trajectories = jnp.zeros((t, n, 2), jnp.float32)
        visibilities = jnp.zeros((t, n), jnp.float32)
        trajectories = trajectories.at[start_frames, jnp.arange(n)].set(q_xy)
        visibilities = visibilities.at[start_frames, jnp.arange(n)].set(1.0)

        # feat_init: query-frame feature at the query point, per point
        grid_xy = q_xy / float(self.stride)
        q_frames = fmaps[start_frames]  # [N, H8, W8, C]
        feat_init = jax.vmap(
            lambda fm, p: bilinear_sample(fm, p[0], p[1], pad_mode="clamp")
        )(q_frames, grid_xy)  # [N, C]

        def gather_window(cf):
            idx = jnp.minimum(cf + jnp.arange(s), t - 1)
            return jnp.take(fmaps, idx, axis=0)

        def body(state):
            cf, traj, vis, frontier = state
            active = frontier == cf

            def run(_):
                coords, vlog, _ = self.model.apply(
                    params, gather_window(cf), traj[cf], feat_init,
                    iters=self.iters,
                )
                return coords, jax.nn.sigmoid(vlog)

            def skip(_):
                return (jnp.zeros((s, n, 2), jnp.float32),
                        jnp.zeros((s, n), jnp.float32))

            coords, wvis = jax.lax.cond(active.any(), run, skip, None)

            n_missing = jnp.maximum(0, cf + s - t)
            frames = cf + jnp.arange(s)  # [S] absolute frame indices
            # write window outputs for frames [cf+1, cf+s-n_missing)
            p = jnp.arange(s)
            writable = (p >= 1) & (p < s - n_missing) & (frames < t)
            wmask = writable[:, None] & active[None, :]  # [S, N]
            safe_frames = jnp.minimum(frames, t - 1)
            cur_t = traj[safe_frames]
            cur_v = vis[safe_frames]
            # scatter with UNCLAMPED indices + mode='drop': when the window
            # overhangs the video end, clamping would make t-1 a duplicate
            # index whose stale payload could nondeterministically overwrite
            # the real frame t-1 update (jnp duplicate-index .set order is
            # implementation-defined); dropped rows never land instead
            traj = traj.at[frames].set(
                jnp.where(wmask[..., None], coords, cur_t), mode="drop"
            )
            vis = vis.at[frames].set(
                jnp.where(wmask, wvis, cur_v), mode="drop"
            )

            # frontier advancement with decaying visibility threshold
            thresh = jnp.where(active, self.vis_threshold0, 0.0)
            earliest = jnp.where(active, cf + 1, frontier)
            last = jnp.where(active, cf + s - n_missing - 1, frontier)

            def adv_cond(st):
                nxt, th = st
                return (vis[nxt, jnp.arange(n)] <= th).any()

            def adv_body(st):
                nxt, th = st
                below = vis[nxt, jnp.arange(n)] <= th
                nxt = jnp.where(below, nxt - 1, nxt)
                wrapped = nxt < earliest
                th = jnp.where(wrapped, th - 0.02, th)
                nxt = jnp.where(wrapped, last, nxt)
                return nxt, th

            nxt, _ = jax.lax.while_loop(adv_cond, adv_body, (last, thresh))
            frontier = jnp.where(active, nxt, frontier)
            return cf + 1, traj, vis, frontier

        def cond(state):
            return state[0] < t - 1

        _, trajectories, visibilities, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), trajectories, visibilities, start_frames)
        )
        return trajectories, visibilities

    def forward(self, rgbs: np.ndarray, query_points: np.ndarray):
        """rgbs [B, T, H, W, 3] uint8; query_points [B, N, 3] (t, x, y)."""
        assert rgbs.shape[0] == 1, "PIPS linking currently runs per-video"
        if self.params is None:  # random-init fallback (no checkpoint)
            self.init_params(jax.random.PRNGKey(0), 64, 64)
        from ..api import as_device_video

        rgbs_in = rgbs  # identity key for the per-video feature cache
        rgbs = as_device_video(rgbs)  # uint8 on device, uploaded once
        qp = np.asarray(query_points, np.float32)[0]
        t = rgbs.shape[0]
        n = qp.shape[0]

        # one-slot per-video cache: the orchestrator calls per mask batch
        # with the identical video object — encode the CNN features once
        cache = getattr(self, "_fmap_cache", None)
        if cache is not None and cache[0] is rgbs_in and cache[1] == rgbs.shape:
            fmaps = cache[2]
        else:
            fmaps = self.encode_video(rgbs)
            self._fmap_cache = (rgbs_in, rgbs.shape, fmaps)

        traj_fwd, vis_fwd = self._forward_direction(fmaps, qp)

        qp_flipped = qp.copy()
        qp_flipped[:, 0] = t - qp[:, 0] - 1
        traj_bwd, vis_bwd = self._forward_direction(fmaps[::-1], qp_flipped)
        traj_bwd = traj_bwd[::-1]
        vis_bwd = vis_bwd[::-1]

        # stitch at each point's query frame: backward before, forward after
        starts = qp[:, 0].astype(np.int64)
        tgrid = np.arange(t)[:, None]
        before = tgrid < starts[None, :]
        trajectories = np.where(before[..., None], traj_bwd, traj_fwd)
        visibilities = np.where(before, vis_bwd, vis_fwd) > 0.5

        return (
            trajectories[None].astype(np.float32),
            visibilities[None].astype(np.float32),
        )
