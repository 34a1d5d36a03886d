"""RAFT point tracker: chained optical-flow trajectory integration.

Reference semantics (sam_pt/point_tracker/raft/tracker.py): forward and
backward flow between every consecutive frame pair (32 iterations each,
:37-41); trajectories integrate forward flow from each point's query frame by
bilinear flow sampling (:46-64), then a backward pass fills frames before the
query frame (:66-81); visibility = in-bounds only (:84-87).

TPU-first: frames are padded to /8 and flow pairs run as batched jitted calls
(chunked); the two integration passes are `lax.scan`s over time on device
(fixed shapes; query-frame pinning via masking).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..api import PointTracker
from .model import Raft
from ....ops.sampling import bilinear_sample_nchw
from ....utils.util import jitted_init


class RaftPointTracker(PointTracker):
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        iters: int = 32,
        flow_chunk: int = 4,
        dtype=jnp.float32,
        params=None,
        allow_random_init: bool = False,
    ):
        self.iters = iters
        self.flow_chunk = flow_chunk
        self.model = Raft(dtype=dtype)
        if params is None and checkpoint_path is not None:
            import os

            if os.path.exists(checkpoint_path):
                from ....utils.checkpoint import load_raft_checkpoint

                params = load_raft_checkpoint(checkpoint_path)
            elif not allow_random_init:
                raise FileNotFoundError(
                    f"Raft checkpoint not found at {checkpoint_path}"
                )
        self.params = params

        self._flow = jax.jit(
            lambda p, i1, i2: self.model.apply(p, i1, i2, iters=self.iters)
        )

    def init_params(self, key, height: int = 64, width: int = 64):
        img = jnp.zeros((1, height, width, 3))
        self.params = jitted_init(self.model, key, img, img, iters=1)
        return self.params

    def _compute_flows(self, frames: np.ndarray):
        """frames [T, H, W, 3] float [-1, 1] (padded /8) ->
        (flows_fwd, flows_bwd) [T-1, H, W, 2]."""
        t = frames.shape[0]
        pairs_a = frames[:-1]
        pairs_b = frames[1:]
        fwd, bwd = [], []
        bs = self.flow_chunk
        for i in range(0, t - 1, bs):
            a = jnp.asarray(pairs_a[i : i + bs])
            b = jnp.asarray(pairs_b[i : i + bs])
            pad = bs - a.shape[0]
            if pad:
                a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, 0)], 0)
                b = jnp.concatenate([b, jnp.repeat(b[-1:], pad, 0)], 0)
            fwd.append(np.asarray(self._flow(self.params, a, b))[: bs - pad])
            bwd.append(np.asarray(self._flow(self.params, b, a))[: bs - pad])
        return np.concatenate(fwd), np.concatenate(bwd)

    def forward(self, rgbs: np.ndarray, query_points: np.ndarray):
        assert rgbs.shape[0] == 1, "RAFT chaining runs per-video"
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))
        video = np.asarray(rgbs, np.float32)[0]
        qp = np.asarray(query_points, np.float32)[0]
        t, h, w, _ = video.shape
        n = qp.shape[0]

        # pad to multiples of 8 (reference InputPadder), replicate edges
        pad_h = (8 - h % 8) % 8
        pad_w = (8 - w % 8) % 8
        frames = np.pad(
            video, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge"
        )
        frames = frames / 127.5 - 1.0

        flows_fwd, flows_bwd = self._compute_flows(frames)
        flows_fwd = flows_fwd[:, :h, :w]
        flows_bwd = flows_bwd[:, :h, :w]

        q_t = qp[:, 0]
        q_xy = qp[:, 1:]

        if t == 1:
            coords = q_xy[None].astype(np.float32)
        else:
            coords = np.asarray(_integrate_jit(
                jnp.asarray(flows_fwd), jnp.asarray(flows_bwd),
                jnp.asarray(q_t), jnp.asarray(q_xy),
            ))

        visibilities = (
            (coords[..., 0] >= 0)
            & (coords[..., 1] >= 0)
            & (coords[..., 0] < w)
            & (coords[..., 1] < h)
        ).astype(np.float32)
        return coords[None], visibilities[None]


@jax.jit
def _integrate_jit(flows_fwd, flows_bwd, q_t, q_xy):
    """Both trajectory-integration passes as `lax.scan`s on device.

    flows_fwd/flows_bwd [T-1, H, W, 2]; q_t [N]; q_xy [N, 2] ->
    coords [T, N, 2]. One dispatch instead of 2*(T-1) host-synced bilinear
    samples (~25 ms RTT each on a remote-attached chip)."""
    n = q_xy.shape[0]
    tm1 = flows_fwd.shape[0]

    def samp(flow, pts):  # flow [H, W, 2], pts [N, 2] -> deltas [N, 2]
        return bilinear_sample_nchw(
            jnp.transpose(flow, (2, 0, 1))[None],
            pts[None, :, 0], pts[None, :, 1],
        )[0].T

    # forward: integrate flow from each point's query frame onward
    coord0 = jnp.where(
        (q_t == 0)[:, None], q_xy, jnp.zeros((n, 2), jnp.float32)
    )

    def fwd_step(carry, inp):
        ti, flow_prev = inp  # flow frame ti-1 -> ti
        coord = carry + samp(flow_prev, carry)
        coord = jnp.where((q_t == ti)[:, None], q_xy, coord)
        return coord, coord

    _, coords_rest = jax.lax.scan(
        fwd_step, coord0, (jnp.arange(1, tm1 + 1), flows_fwd)
    )
    coords = jnp.concatenate([coord0[None], coords_rest], axis=0)

    # backward: fill frames before each query frame from the successor
    # (the successor may itself already be a backward-filled coordinate)
    def bwd_step(succ, inp):
        ti, flow_bwd, cur = inp
        new = jnp.where(
            (ti < q_t)[:, None], succ + samp(flow_bwd, succ), cur
        )
        return new, new

    _, filled = jax.lax.scan(
        bwd_step, coords[-1],
        (jnp.arange(tm1), flows_bwd, coords[:-1]),
        reverse=True,
    )
    return jnp.concatenate([filled, coords[-1:]], axis=0)
