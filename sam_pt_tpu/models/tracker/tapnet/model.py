"""TapNet (TAP-Net) point tracker model, re-housed from Haiku to Flax.

Re-implements the reference's in-repo JAX/Haiku TAP-Net
(sam_pt/point_tracker/tapnet/tapnet_model.py + models/tsm_resnet.py):

  - TSM-ResNet-18-v2 video backbone (the reference default depth=18 with
    use_bottleneck=False, tsm_resnet.py:322-341): BASIC pre-activation
    blocks (3x3 strided conv_0 + 3x3 conv_2), unit output channels
    (256,512,1024)//4 = (64,128,256), 2 blocks per unit; a Temporal Shift
    Module on the pre-activation in the first two units
    (channel_shift_fraction [.125, .125, 0, 0]); final endpoint
    'tsm_resnet_unit_2' at output stride 8 (strides 1/2/1 after the /4
    stem; the dilation rates of output_stride=8 are unused by basic
    blocks), 256 channels, L2-normalized.
  - A single cost volume between query features and the whole feature grid
    (multi-head split), conv regression head -> spatially softmaxed heatmap
    (temperature 10) -> truncated soft-argmax points, and an occlusion head
    (reference :247-305).
  - Query chunking to bound the cost-volume footprint (:400-409) lives in
    the tracker wrapper.

Inference-mode BatchNorm (running stats as params, checkpoint-supplied). The
dormant `cross_replica_axis='i'` hook of the reference (:206-212) is not
needed: batch statistics are frozen at inference.
Operates per video (no batch axis).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..raft.model import InferenceBatchNorm
from ..tapir.model import convert_coords, l2_normalize, soft_argmax_heatmap
from ....ops.sampling import bilinear_sample

TRAIN_SIZE = (256, 256)


def temporal_shift(
    x: jnp.ndarray,
    fraction: float,
    time_axis: Optional[str] = None,
    bwd_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """TSM with the reference's ROLLED channel layout (tsm_utils.py:116-148):
    output = concat([x[t+1] last n_shift ch, x[t] middle ch,
                     x[t-1] first n_shift ch]) — i.e. output channel i draws
    from a DIFFERENT input channel range, a permutation the trained conv
    weights bake in.

    x: [T, H, W, C] (single video; T is the LOCAL shard when `time_axis` is
    set).

    Time-sharded mode (`time_axis`): the video's frame axis is sharded over
    a mesh axis and this op is the only cross-frame coupling in the whole
    TSM-ResNet — a 1-frame halo. Each device ships its first frame to the
    left neighbor and its last frame to the right neighbor over the ring
    (`lax.ppermute` riding ICI), reproducing the unsharded shift exactly.
    `bwd_valid` [T_local] masks backward-shift sources that are padding
    frames (global frame ids >= the real frame count), which keeps the last
    REAL frame's zero boundary identical to the unsharded computation.
    """
    if fraction <= 0:
        return x
    c = x.shape[-1]
    n_shift = int(c * fraction)
    if time_axis is None:
        bwd = jnp.concatenate(
            [x[1:, ..., c - n_shift:],
             jnp.zeros_like(x[:1, ..., c - n_shift:])],
            axis=0,
        )
        fwd = jnp.concatenate(
            [jnp.zeros_like(x[:1, ..., :n_shift]), x[:-1, ..., :n_shift]],
            axis=0,
        )
    else:
        n_dev = jax.lax.axis_size(time_axis)
        idx = jax.lax.axis_index(time_axis)
        # ring halo exchange: first frame -> left neighbor (feeds its bwd),
        # last frame -> right neighbor (feeds its fwd)
        from_right = jax.lax.ppermute(
            x[:1], time_axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        from_left = jax.lax.ppermute(
            x[-1:], time_axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        from_right = from_right * (idx < n_dev - 1).astype(x.dtype)
        from_left = from_left * (idx > 0).astype(x.dtype)
        bwd = jnp.concatenate(
            [x[1:, ..., c - n_shift:], from_right[..., c - n_shift:]], axis=0
        )
        if bwd_valid is not None:
            bwd = bwd * bwd_valid[:, None, None, None].astype(x.dtype)
        fwd = jnp.concatenate(
            [from_left[..., :n_shift], x[:-1, ..., :n_shift]], axis=0
        )
    mid = x[..., n_shift : c - n_shift]
    return jnp.concatenate([bwd, mid, fwd], axis=-1)


class TSMBasicBlockV2(nn.Module):
    """Pre-activation BASIC block with optional temporal shift
    (tsm_resnet.py:44-176, use_bottleneck=False): BN+relu preact; projection
    shortcut from the preact (identity from the raw input otherwise); TSM on
    the preact; conv_0 3x3 (carries the stride); BN+relu; conv_2 3x3."""

    output_channels: int
    stride: int = 1
    use_projection: bool = False
    shift_fraction: float = 0.0
    time_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bwd_valid=None):  # [T, H, W, C]
        preact = InferenceBatchNorm(x.shape[-1], name="bn_pre")(x)
        preact = nn.relu(preact)

        if self.use_projection:
            shortcut = nn.Conv(self.output_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="shortcut_conv",
                               dtype=self.dtype)(preact)
        else:
            shortcut = x

        y = temporal_shift(preact, self.shift_fraction, self.time_axis,
                           bwd_valid)
        y = nn.Conv(self.output_channels, (3, 3),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, name="conv_0", dtype=self.dtype)(y)
        y = nn.relu(InferenceBatchNorm(self.output_channels, name="bn_1")(y))
        y = nn.Conv(self.output_channels, (3, 3), padding="SAME",
                    use_bias=False, name="conv_2", dtype=self.dtype)(y)
        return y + shortcut


class TSMResNetV2(nn.Module):
    """[T, H, W, 3] -> unit-2 feature grid [T, H/8, W/8, 256].

    Reference defaults: depth 18 (basic blocks, 2 per unit), unit channels
    (256,512,1024)//4, output_stride 8 -> unit strides (1,2,1) after the /4
    stem (tsm_resnet.py:302-341, 402-407)."""

    blocks_per_unit: Sequence[int] = (2, 2, 2)
    channels_per_unit: Sequence[int] = (64, 128, 256)
    strides_per_unit: Sequence[int] = (1, 2, 1)  # output stride 8 overall
    shift_fractions: Sequence[float] = (0.125, 0.125, 0.0)
    time_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bwd_valid=None):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, name="initial_conv", dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for ui, (nb, ch, st, sf) in enumerate(
            zip(self.blocks_per_unit, self.channels_per_unit,
                self.strides_per_unit, self.shift_fractions)
        ):
            for bi in range(nb):
                x = TSMBasicBlockV2(
                    output_channels=ch,
                    stride=st if bi == 0 else 1,
                    use_projection=(bi == 0),
                    shift_fraction=sf,
                    time_axis=self.time_axis,
                    name=f"unit{ui}_block{bi}",
                    dtype=self.dtype,
                )(x, bwd_valid)
        return x


class TAPNet(nn.Module):
    num_heads: int = 1
    softmax_temperature: float = 10.0
    # Mesh-axis name for ring-style TEMPORAL sharding: frames are sharded
    # over this axis (run under shard_map; see parallel/temporal.py). The
    # TSM halo rides ppermute, query features psum from the owning shard,
    # everything else in the model is per-frame local. Param tree is
    # identical either way.
    time_axis: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.tsm_resnet = TSMResNetV2(time_axis=self.time_axis,
                                      dtype=self.dtype)
        self.cost_conv1 = nn.Conv(16, (3, 3), padding="SAME",
                                  name="cost_volume_regression_1",
                                  dtype=self.dtype)
        self.cost_conv2 = nn.Conv(1, (3, 3), padding="SAME",
                                  name="cost_volume_regression_2",
                                  dtype=self.dtype)
        self.occ_conv1 = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                                 name="cost_volume_occlusion_1",
                                 dtype=self.dtype)
        self.occ_linear1 = nn.Dense(16, name="cost_volume_occlusion_2",
                                    dtype=self.dtype)
        self.occ_out = nn.Dense(1, name="occlusion_out", dtype=self.dtype)

    def get_feature_grid(self, video: jnp.ndarray,
                         bwd_valid=None) -> jnp.ndarray:
        """video [T, 256, 256, 3] in [-1, 1] -> [T, 32, 32, 1024] normalized."""
        return l2_normalize(
            self.tsm_resnet(video.astype(self.dtype), bwd_valid))

    def __call__(self, video: jnp.ndarray, query_points: jnp.ndarray,
                 t_valid: Optional[int] = None):
        """query_points [N, 3] (t, y, x) raster(256).

        Returns dict(tracks [N, T, 2] xy raster, occlusion [N, T]).

        Time-sharded mode (`self.time_axis` set, running under shard_map):
        `video` is the LOCAL frame shard; `t_valid` is the GLOBAL real frame
        count (frames past it are padding added to even out the shards).
        Outputs are local shards [N, T_local, ...].
        """
        t_local = video.shape[0]
        if self.time_axis is not None:
            shard = jax.lax.axis_index(self.time_axis)
            frame_ids = shard * t_local + jnp.arange(t_local)  # global ids
            t_total = t_valid if t_valid is not None else (
                t_local * jax.lax.axis_size(self.time_axis))
            bwd_valid = (frame_ids < t_total - 1).astype(self.dtype)
        else:
            frame_ids = jnp.arange(t_local)
            bwd_valid = None

        grid = self.get_feature_grid(video, bwd_valid)
        t, gh, gw, c = grid.shape
        n = query_points.shape[0]

        t_idx = jnp.round(query_points[:, 0]).astype(jnp.int32)
        # raster -> grid index space: plain ratio scale then the -0.5 the
        # reference interp applies (tapnet_model.py:33-60, transforms.py:77-80)
        gy = query_points[:, 1] * (gh / TRAIN_SIZE[0]) - 0.5
        gx = query_points[:, 2] * (gw / TRAIN_SIZE[1]) - 0.5
        if self.time_axis is not None:
            # each query frame lives on exactly one shard: sample there,
            # zero elsewhere, psum over the time axis
            local_t = t_idx - shard * t_local
            in_shard = (local_t >= 0) & (local_t < t_local)
            safe_t = jnp.clip(local_t, 0, t_local - 1)
            q_feats = jax.vmap(
                lambda fr, x, y: bilinear_sample(fr, x, y, pad_mode="clamp")
            )(grid[safe_t], gx, gy)  # [N, C]
            q_feats = q_feats * in_shard[:, None].astype(q_feats.dtype)
            q_feats = jax.lax.psum(q_feats, self.time_axis)
        else:
            q_feats = jax.vmap(
                lambda fr, x, y: bilinear_sample(fr, x, y, pad_mode="clamp")
            )(grid[t_idx], gx, gy)  # [N, C]

        d = self.num_heads
        grid_heads = grid.reshape(t, gh, gw, c // d, d)
        q_heads = q_feats.reshape(n, c // d, d)

        cost = jnp.einsum("ncd,thwcd->tnhwd", q_heads, grid_heads)
        cost = cost.reshape(t * n, gh, gw, d)

        hid = nn.relu(self.cost_conv1(cost))
        pos = self.cost_conv2(hid)[..., 0].reshape(t, n, gh, gw)
        pos = pos.transpose(1, 0, 2, 3)
        softmaxed = jax.nn.softmax(
            (pos * self.softmax_temperature).reshape(n, t, -1), axis=-1
        ).reshape(n, t, gh, gw)
        pts_grid = jax.vmap(jax.vmap(soft_argmax_heatmap))(softmaxed)
        points = convert_coords(pts_grid, (gw, gh),
                                (TRAIN_SIZE[1], TRAIN_SIZE[0]))

        occ = self.occ_conv1(hid)
        occ = occ.mean(axis=(1, 2))
        occ = nn.relu(self.occ_linear1(occ))
        occ = self.occ_out(occ).reshape(t, n).T  # [N, T]

        # pin the query frame to the query point (global frame ids, so
        # the sharded path pins on whichever shard owns the query frame)
        onehot = (t_idx[:, None] == frame_ids[None, :]).astype(points.dtype)
        q_xy = query_points[:, jnp.array([2, 1])]
        points = (
            points * (1 - onehot)[..., None]
            + q_xy[:, None, :] * onehot[..., None]
        )
        return {"tracks": points, "occlusion": occ}
