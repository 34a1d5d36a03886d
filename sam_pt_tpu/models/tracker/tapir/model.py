"""TAPIR point tracker model, re-housed from Haiku to Flax, TPU-native.

Re-implements the reference's in-repo JAX/Haiku TAPIR
(sam_pt/point_tracker/tapir/tapir_model.py) with the same architecture:

  - ResNet-v2 backbone (instancenorm affine, basic blocks, strides 1/2/2/1,
    channels 64/128/256/256, projection shortcuts, no maxpool); 'hires'
    features = group-1 output (/4, 128ch), 'lowres' = group-3 output
    (/8, 256ch), both L2-normalized (reference :569-642).
  - Cost-volume initialization: per-query cost volume -> conv regression
    head -> truncated soft-argmax points, plus occlusion/expected-dist head
    (reference :349-417; temperature 20, threshold 5).
  - PIPs-style refinement (4 iterations): 7x7 correlation patches around the
    current track from [hires, lowres, lowres avg-pooled] extracted with the
    separable hat-weight matmul (the reference's own TPU guidance — "on TPU,
    matmul is cheap and gather is expensive", :489), fed with occ/expd state
    and running track features into the depthwise-conv PIPSMLPMixer
    (hidden 512, 12 blocks, kernel 3, reference :101-156, :419-567).

Supports both offline and causal/streaming modes (reference :773-819): with
`use_causal_conv=True` the mixer's depthwise convs pad causally and
`online_step` carries per-block conv context across frame chunks.
Operates per video (no batch axis); the tracker vmaps/chunks queries.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ....ops.sampling import bilinear_sample, separable_neighborhood_sample

TRAIN_SIZE = (256, 256)  # (height, width)


def _halo_time_pad(y, time_axis, frame_valid, halo=1):
    """Ring halo for a time-axis 'SAME' conv under temporal sharding.

    y: [N, F_local, C]. Returns [N, F_local + 2*halo, C] equal to the
    zero-'SAME' padding of the GLOBAL frame sequence: each device zeroes
    its padding frames (`frame_valid`), ships its first/last `halo` frames
    to its neighbors over the ring (`lax.ppermute` riding ICI), and global
    edges get zeros — so a VALID conv over the result is numerically
    identical to the unsharded SAME conv."""
    n_dev = jax.lax.axis_size(time_axis)
    idx = jax.lax.axis_index(time_axis)
    if frame_valid is not None:
        y = y * frame_valid[None, :, None].astype(y.dtype)
    from_right = jax.lax.ppermute(
        y[:, :halo], time_axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    from_left = jax.lax.ppermute(
        y[:, -halo:], time_axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    from_right = from_right * (idx < n_dev - 1).astype(y.dtype)
    from_left = from_left * (idx > 0).astype(y.dtype)
    return jnp.concatenate([from_left, y, from_right], axis=1)


def l2_normalize(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=True), eps)
    )


def affine_instance_norm(x, scale, offset, eps=1e-5):
    """InstanceNorm with scale/offset over NHWC spatial dims."""
    mu = x.mean(axis=(-3, -2), keepdims=True)
    var = x.var(axis=(-3, -2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + offset


class InstanceNormAffine(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        offset = self.param("offset", nn.initializers.zeros, (self.features,))
        return affine_instance_norm(x, scale, offset)


class BlockV2(nn.Module):
    """Pre-activation basic residual block (haiku BlockV2, bottleneck=False)."""

    channels: int
    stride: int = 1
    use_projection: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = InstanceNormAffine(x.shape[-1], name="norm_0")(x)
        y = nn.relu(y)
        if self.use_projection:
            shortcut = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="shortcut_conv",
                               dtype=self.dtype)(y)
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, name="conv_0",
                    dtype=self.dtype)(y)
        y = InstanceNormAffine(self.channels, name="norm_1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    name="conv_1", dtype=self.dtype)(y)
        return y + shortcut


class TapirResNet(nn.Module):
    """Backbone: [T, H, W, 3] -> {'hires': /4 128ch, 'lowres': /8 256ch}."""

    channels: Sequence[int] = (64, 128, 256, 256)
    blocks: Sequence[int] = (2, 2, 2, 2)
    strides: Sequence[int] = (1, 2, 2, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, name="initial_conv", dtype=self.dtype)(x)
        out = {}
        for gi, (ch, nb, st) in enumerate(
            zip(self.channels, self.blocks, self.strides)
        ):
            for bi in range(nb):
                x = BlockV2(
                    channels=ch,
                    stride=st if bi == 0 else 1,
                    use_projection=(bi == 0),
                    name=f"group{gi}_block{bi}",
                    dtype=self.dtype,
                )(x)
            out[f"resnet_unit_{gi}"] = x
        return out


class PIPsConvBlock(nn.Module):
    """Depthwise-conv mixer block: time-mixing dwconvs + channel MLP.

    Causal/streaming mode (reference :39-124): both depthwise convs use
    left-only padding and optionally consume/emit `causal context` — the last
    (kernel-1) input frames of each conv — so the block can be applied to new
    frames online with identical outputs to the offline pass.
    """

    kernel_shape: int = 3
    use_causal_conv: bool = False
    # Mesh axis for ring-style temporal sharding: the two time-mixing
    # depthwise convs become VALID convs over ring-halo-padded local frame
    # shards (see _halo_time_pad); numerically identical to unsharded.
    # Incompatible with use_causal_conv / causal context.
    time_axis: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_context=None, get_causal_context=False,
                 frame_valid=None):
        c = x.shape[-1]
        k = self.kernel_shape
        pad = ((k - 1, 0),) if self.use_causal_conv else "SAME"
        halo = (k - 1) // 2
        if self.time_axis is not None:
            assert not self.use_causal_conv and causal_context is None
            pad = "VALID"
        new_ctx = {}

        skip = x
        y = nn.LayerNorm(use_bias=False, name="norm1")(x)
        if causal_context is not None:
            y = jnp.concatenate([causal_context["causal_1"], y], axis=-2)
            extra = causal_context["causal_1"].shape[-2]
        if get_causal_context:
            new_ctx["causal_1"] = y[..., -(k - 1):, :]
        if self.time_axis is not None:
            y = _halo_time_pad(y, self.time_axis, frame_valid, halo)
        # dw conv 1: channel multiplier 4, interleaved output layout
        y = nn.Conv(4 * c, (k,), padding=pad,
                    feature_group_count=c, name="dw1", dtype=self.dtype)(y)
        y = nn.gelu(y)
        if causal_context is not None:
            y = jnp.concatenate(
                [causal_context["causal_2"], y[..., extra:, :]], axis=-2
            )
            extra = causal_context["causal_2"].shape[-2]
        if get_causal_context:
            new_ctx["causal_2"] = y[..., -(k - 1):, :]
        if self.time_axis is not None:
            y = _halo_time_pad(y, self.time_axis, frame_valid, halo)
        y = nn.Conv(4 * c, (k,), padding=pad,
                    feature_group_count=4 * c, name="dw2", dtype=self.dtype)(y)
        if causal_context is not None:
            y = y[..., extra:, :]
        # collapse the 4 per-channel copies (reference :87)
        y = y[..., 0::4] + y[..., 1::4] + y[..., 2::4] + y[..., 3::4]
        x = skip + y
        skip = x
        y = nn.LayerNorm(use_bias=False, name="norm2")(x)
        y = nn.Dense(4 * c, name="mlp2_up", dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(c, name="mlp2_down", dtype=self.dtype)(y)
        return skip + y, new_ctx


class PIPSMLPMixer(nn.Module):
    output_channels: int
    hidden_dim: int = 512
    num_blocks: int = 12
    kernel_shape: int = 3
    use_causal_conv: bool = False
    time_axis: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_context=None, get_causal_context=False,
                 frame_valid=None):
        """x: [N, F, C_in]; causal_context: list (per block) of dicts."""
        x = nn.Dense(self.hidden_dim, name="input_proj", dtype=self.dtype)(x)
        all_ctx = []
        for i in range(self.num_blocks):
            ctx = causal_context[i] if causal_context is not None else None
            x, new_ctx = PIPsConvBlock(
                self.kernel_shape, self.use_causal_conv,
                time_axis=self.time_axis, name=f"block_{i}",
                dtype=self.dtype,
            )(x, ctx, get_causal_context, frame_valid)
            all_ctx.append(new_ctx)
        x = nn.LayerNorm(use_bias=False, name="out_norm")(x)
        out = nn.Dense(self.output_channels, name="out_proj",
                       dtype=self.dtype)(x)
        if get_causal_context or causal_context is not None:
            return out, all_ctx
        return out


def convert_coords(coords, src_wh, dst_wh):
    """Plain size-ratio scaling per axis. Despite its docstring, the
    reference's transforms.convert_grid_coordinates does NOT apply the
    +0.5/-0.5 corner alignment — it multiplies by output/input directly
    (reference tapir/utils/transforms.py:77-80)."""
    ratio = jnp.array(
        [dst_wh[0] / src_wh[0], dst_wh[1] / src_wh[1]], jnp.float32
    )
    return coords * ratio


def soft_argmax_heatmap(heatmap: jnp.ndarray, threshold: float = 5.0):
    """Truncated soft-argmax over [H, W] probabilities -> (x, y) CELL-CENTER
    grid coords (index + 0.5, reference model_utils.py:119-139)."""
    h, w = heatmap.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    flat = heatmap.reshape(-1)
    am = jnp.argmax(flat)
    ay = (am // w).astype(jnp.float32) + 0.5
    ax = (am % w).astype(jnp.float32) + 0.5
    dist2 = (gy - ay) ** 2 + (gx - ax) ** 2
    valid = (dist2 < threshold ** 2).astype(jnp.float32)
    weights = heatmap * valid
    denom = jnp.maximum(weights.sum(), 1e-12)
    x = (gx * weights).sum() / denom
    y = (gy * weights).sum() / denom
    return jnp.stack([x, y])


class TAPIR(nn.Module):
    highres_dim: int = 128
    lowres_dim: int = 256
    num_pips_iter: int = 4
    pyramid_level: int = 1
    mixer_hidden_dim: int = 512
    num_mixer_blocks: int = 12
    patch_size: int = 7
    softmax_temperature: float = 20.0
    use_causal_conv: bool = False
    # Mesh axis for ring-style temporal sharding (run under shard_map; see
    # parallel/temporal.py): frames shard over this axis. The ResNet and all
    # cost-volume/occlusion heads are frame-local; the mixer's time convs
    # use ring halos; query features psum from the owning shard. Numerics
    # identical to unsharded. Incompatible with use_causal_conv.
    time_axis: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.resnet = TapirResNet(dtype=self.dtype)
        self.pips_mixer = PIPSMLPMixer(
            4 + self.highres_dim + self.lowres_dim,
            hidden_dim=self.mixer_hidden_dim,
            num_blocks=self.num_mixer_blocks,
            use_causal_conv=self.use_causal_conv,
            time_axis=self.time_axis,
            dtype=self.dtype,
        )
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
        self.occ_out = nn.Dense(2, name="occlusion_out", dtype=self.dtype)

    # ------------------------------------------------------------------
    def get_feature_grids(self, video: jnp.ndarray):
        """video [T, 256, 256, 3] in [-1, 1] -> (hires /4, lowres /8),
        both L2-normalized over channels."""
        out = self.resnet(video.astype(self.dtype))
        hires = l2_normalize(out["resnet_unit_1"])
        lowres = l2_normalize(out["resnet_unit_3"])
        return hires, lowres

    def get_query_features(self, hires, lowres, query_points):
        """query_points [N, 3] (t, y, x) raster(256) coords -> per-point
        features sampled from each grid at the query frame.

        Time-sharded mode: t indexes GLOBAL frames; each query's frame lives
        on one shard — sample there, zero elsewhere, psum over the axis."""
        t_idx = jnp.round(query_points[:, 0]).astype(jnp.int32)
        if self.time_axis is not None:
            t_local = hires.shape[0]
            shard = jax.lax.axis_index(self.time_axis)
            local_t = t_idx - shard * t_local
            in_shard = (local_t >= 0) & (local_t < t_local)
            safe_t = jnp.clip(local_t, 0, t_local - 1)
        else:
            in_shard = None
            safe_t = t_idx

        def sample_grid(grid):
            # raster -> grid index space: plain ratio scale, then the -0.5
            # that reference model_utils.interp applies (raster coords name
            # pixel corners; index space names centers)
            gh, gw = grid.shape[1], grid.shape[2]
            yx = jnp.stack(
                [
                    query_points[:, 1] * (gh / TRAIN_SIZE[0]) - 0.5,
                    query_points[:, 2] * (gw / TRAIN_SIZE[1]) - 0.5,
                ],
                axis=-1,
            )
            frames = grid[safe_t]  # [N, gh, gw, C]
            q = jax.vmap(
                lambda fr, p: bilinear_sample(fr, p[1], p[0], pad_mode="clamp")
            )(frames, yx)
            if in_shard is not None:
                q = q * in_shard[:, None].astype(q.dtype)
                q = jax.lax.psum(q, self.time_axis)
            return q

        return sample_grid(hires), sample_grid(lowres)

    # ------------------------------------------------------------------
    def tracks_from_cost_volume(self, query_feats, lowres, query_points):
        """query_feats [N, C]; lowres [T, H8, W8, C]; query_points [N, 3]
        (t, y, x) raster coords. Returns (points [N, T, 2] xy raster,
        occ [N, T], expd [N, T])."""
        t, h8, w8, c = lowres.shape
        n = query_feats.shape[0]
        cost = jnp.einsum("nc,thwc->tnhw", query_feats, lowres)
        cost = cost.reshape(t * n, h8, w8, 1)

        hid = nn.relu(self.cost_conv1(cost))
        pos = self.cost_conv2(hid)[..., 0]  # [t*n, h8, w8]
        pos = pos.reshape(t, n, h8, w8).transpose(1, 0, 2, 3)  # [N, T, h, w]
        softmaxed = jax.nn.softmax(
            (pos * self.softmax_temperature).reshape(n, t, -1), axis=-1
        ).reshape(n, t, h8, w8)
        pts_grid = jax.vmap(jax.vmap(soft_argmax_heatmap))(softmaxed)  # [N,T,2]
        points = convert_coords(pts_grid, (w8, h8),
                                (TRAIN_SIZE[1], TRAIN_SIZE[0]))

        occ = nn.relu(self.occ_conv1(hid))
        occ = occ.mean(axis=(1, 2))  # [t*n, 32]
        occ = nn.relu(self.occ_linear1(occ))
        occ = self.occ_out(occ).reshape(t, n, 2)
        occlusion = occ[..., 0].T  # [N, T]
        expected_dist = occ[..., 1].T

        if query_points is not None:
            # pin the query frame to the query point exactly (global frame
            # ids under temporal sharding, so the owning shard pins)
            q_t = jnp.round(query_points[:, 0]).astype(jnp.int32)
            if self.time_axis is not None:
                shard = jax.lax.axis_index(self.time_axis)
                local_ids = shard * t + jnp.arange(t)
                onehot = (q_t[:, None] == local_ids[None, :]).astype(
                    points.dtype)
            else:
                onehot = jax.nn.one_hot(q_t, t)  # [N, T]
            q_xy = query_points[:, jnp.array([2, 1])]  # (x, y) from (t, y, x)
            points = (
                points * (1 - onehot)[..., None]
                + q_xy[:, None, :] * onehot[..., None]
            )
        return points, occlusion, expected_dist

    # ------------------------------------------------------------------
    def refine_pips(self, query_feats, pyramid, pos_guess, occ_guess,
                    expd_guess, last_iter=None, causal_context=None,
                    get_causal_context=False, frame_valid=None):
        """One refinement pass.

        query_feats: (hires [N, Ch], lowres [N, Cl]); pyramid: list of grids
        [T, h, w, C] (hires, lowres, pooled lowres); pos_guess [N, T, 2] xy
        raster(256); occ/expd [N, T]; last_iter [N, T, Ch+Cl] | None.
        """
        n, t = occ_guess.shape
        half = self.patch_size // 2
        offs = jnp.arange(-half, half + 1, dtype=jnp.float32)

        corrs_pyr = []
        queries = [query_feats[0], query_feats[1]]
        for _ in range(self.pyramid_level):
            queries.append(queries[-1])
        for pyridx, (query, grid) in enumerate(zip(queries, pyramid)):
            gh, gw = grid.shape[1], grid.shape[2]
            # raster -> grid: ratio scale, then the -0.5 interp offset
            # (reference refine_pips :444-447 + model_utils.interp :91)
            coords = convert_coords(
                pos_guess, (TRAIN_SIZE[1], TRAIN_SIZE[0]), (gw, gh)
            ) - 0.5  # [N, T, 2] xy grid index coords
            if last_iter is not None:
                if pyridx == 0:
                    q = last_iter[..., : self.highres_dim]  # [N, T, Ch]
                else:
                    q = last_iter[..., self.highres_dim :]
                corrs = jnp.einsum("thwc,ntc->nthw", grid, q)
            else:
                corrs = jnp.einsum("thwc,nc->nthw", grid, query)
            patches = separable_neighborhood_sample(
                corrs, coords[..., 0], coords[..., 1], offs, offs,
                zero_pad=True,
            )  # [N, T, P, P]
            corrs_pyr.append(patches.reshape(n, t, -1))
        corrs_cat = jnp.concatenate(corrs_pyr, axis=-1)

        if last_iter is None:
            feats = jnp.concatenate([queries[0], queries[1]], axis=-1)
            feats = jnp.broadcast_to(feats[:, None, :], (n, t, feats.shape[-1]))
        else:
            feats = last_iter

        mlp_input = jnp.concatenate(
            [
                jnp.zeros_like(pos_guess),  # pos input zeroed (reference :528)
                occ_guess[..., None],
                expd_guess[..., None],
                feats,
                corrs_cat,
            ],
            axis=-1,
        )
        if causal_context is not None or get_causal_context:
            res, new_ctx = self.pips_mixer(
                mlp_input, causal_context, get_causal_context
            )
        else:
            res = self.pips_mixer(
                mlp_input, frame_valid=frame_valid
            )  # [N, T, 4 + Ch + Cl]
            new_ctx = None

        # position update predicted in the (resized) feature resolution;
        # at TRAIN_SIZE the conversion is identity
        pos_update = res[..., :2]
        out = (
            pos_guess + pos_update,
            occ_guess + res[..., 2],
            expd_guess + res[..., 3],
            res[..., 4:] + feats,
        )
        if causal_context is not None or get_causal_context:
            return out + (new_ctx,)
        return out

    # ------------------------------------------------------------------
    def __call__(self, video: jnp.ndarray, query_points: jnp.ndarray,
                 t_valid=None):
        """video [T, 256, 256, 3] in [-1, 1]; query_points [N, 3] (t, y, x)
        raster coords. Returns dict(tracks [N, T, 2] xy, occlusion [N, T],
        expected_dist [N, T]) from the final refinement iteration.

        Time-sharded mode (`self.time_axis`, under shard_map): `video` is
        the LOCAL frame shard, `t_valid` the GLOBAL real frame count; local
        output shards are returned."""
        frame_valid = None
        if self.time_axis is not None:
            t_local = video.shape[0]
            shard = jax.lax.axis_index(self.time_axis)
            frame_ids = shard * t_local + jnp.arange(t_local)
            t_total = t_valid if t_valid is not None else (
                t_local * jax.lax.axis_size(self.time_axis))
            frame_valid = (frame_ids < t_total).astype(jnp.float32)
        hires, lowres = self.get_feature_grids(video)
        q_hi, q_lo = self.get_query_features(hires, lowres, query_points)

        points, occlusion, expected_dist = self.tracks_from_cost_volume(
            q_lo, lowres, query_points
        )

        pyramid = [hires, lowres]
        for _ in range(self.pyramid_level):
            prev = pyramid[-1]
            pyramid.append(
                nn.avg_pool(prev, (2, 2), strides=(2, 2))
            )

        mixer_feats = None
        for _ in range(self.num_pips_iter):
            points, occlusion, expected_dist, mixer_feats = self.refine_pips(
                (q_hi, q_lo), pyramid, points, occlusion, expected_dist,
                last_iter=mixer_feats, frame_valid=frame_valid,
            )

        return {
            "tracks": points,
            "occlusion": occlusion,
            "expected_dist": expected_dist,
        }

    # ------------------------------------------------------------------
    # Online / streaming mode (reference :773-819, causal conv context)
    # ------------------------------------------------------------------
    def get_query_features_online(self, frames, query_points):
        """frames [F, 256, 256, 3] containing the query frames;
        query_points [N, 3] (t, y, x) with t indexing into `frames`."""
        hires, lowres = self.get_feature_grids(frames)
        return self.get_query_features(hires, lowres, query_points)

    def online_step(self, frames, q_hi, q_lo, causal_state=None,
                    query_points=None):
        """Track a chunk of new frames with carried causal-conv context.

        frames: [F, 256, 256, 3] in [-1, 1]; q_hi/q_lo: query features from
        `get_query_features_online`; causal_state: per-refinement-iteration
        list of per-block context dicts (None for the first chunk).
        Returns (dict(tracks [N, F, 2], occlusion, expected_dist), new_state).
        """
        hires, lowres = self.get_feature_grids(frames)
        points, occlusion, expected_dist = self.tracks_from_cost_volume(
            q_lo, lowres, query_points
        )

        pyramid = [hires, lowres]
        for _ in range(self.pyramid_level):
            pyramid.append(nn.avg_pool(pyramid[-1], (2, 2), strides=(2, 2)))

        mixer_feats = None
        new_state = []
        for i in range(self.num_pips_iter):
            ctx = causal_state[i] if causal_state is not None else None
            points, occlusion, expected_dist, mixer_feats, new_ctx = (
                self.refine_pips(
                    (q_hi, q_lo), pyramid, points, occlusion, expected_dist,
                    last_iter=mixer_feats, causal_context=ctx,
                    get_causal_context=True,
                )
            )
            new_state.append(new_ctx)
        out = {
            "tracks": points,
            "occlusion": occlusion,
            "expected_dist": expected_dist,
        }
        return out, new_state
