"""PIPS++ (PIPs2) point-tracking model, TPU-native.

Re-implements the reference's in-repo PIPS++
(sam_pt/point_tracker/pips_plus_plus/pips_plus_plus.py): BasicEncoder CNN
(instance norm, stride 8) shared with the PIPS family; a 1D-conv residual
DeltaBlock over the window's time axis (8 blocks, channel doubling every 2,
instance-norm-1d pre-activations, :265-338); multi-delay correlation — the
query-frame features plus features sampled at the trajectory's positions 2
and 4 frames earlier (:488-512) — sampled at 4 pyramid levels radius 3.

Like our PIPS, the model consumes PRECOMPUTED per-frame feature maps; the
refinement loop is a static unroll inside one jit; correlation and
neighborhood sampling are MXU matmuls.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..pips.model import (
    BasicEncoder,
    correlation_pyramid,
    sample_corr_pyramid,
)
from ....ops.posemb import posemb_sincos_2d_xy
from ....ops.sampling import bilinear_sample


def instance_norm_1d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm1d(affine=False) on [B, S, C]: normalize over S."""
    mu = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class ResidualBlock1d(nn.Module):
    out_channels: int
    kernel_size: int = 3
    is_first_block: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, S, C]
        in_channels = x.shape[-1]
        out = x
        if not self.is_first_block:
            out = nn.relu(instance_norm_1d(out))
        out = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                      name="conv1", dtype=self.dtype)(out)
        out = nn.relu(instance_norm_1d(out))
        out = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                      name="conv2", dtype=self.dtype)(out)

        identity = x
        if self.out_channels != in_channels:
            ch1 = (self.out_channels - in_channels) // 2
            ch2 = self.out_channels - in_channels - ch1
            identity = jnp.pad(identity, ((0, 0), (0, 0), (ch1, ch2)))
        return out + identity


class DeltaBlock1d(nn.Module):
    """1D-conv residual net over the window time axis -> per-frame dcoords."""

    latent_dim: int = 128
    base_filters: int = 128
    n_block: int = 8
    increasefilter_gap: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fcorr, flow):  # [B, S, 3*LRR], [B, S, 2]
        flow_emb = posemb_sincos_2d_xy(flow, self.latent_dim, cat_coords=True)
        x = jnp.concatenate([fcorr, flow_emb], axis=-1)

        x = nn.Conv(self.base_filters, (3,), padding="SAME",
                    name="first_block_conv", dtype=self.dtype)(x)
        x = nn.relu(x)
        out_channels = self.base_filters
        for i in range(self.n_block):
            if i == 0:
                out_channels = self.base_filters
            else:
                in_ch = int(
                    self.base_filters * 2 ** ((i - 1) // self.increasefilter_gap)
                )
                out_channels = (
                    in_ch * 2 if (i % self.increasefilter_gap == 0) else in_ch
                )
            x = ResidualBlock1d(out_channels, is_first_block=(i == 0),
                                name=f"block_{i}", dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(2, name="dense", dtype=self.dtype)(x)


class PipsPlusPlus(nn.Module):
    """Window model over precomputed feature maps.

    forward(fmaps [S, H8, W8, C], coords_init [S, N, 2] pixels,
            feat_init (feats1, feats2, feats4) each [S, N, C] | None)
      -> (coords [S, N, 2] pixels, (feats1, feats2, feats4))
    """

    stride: int = 8
    latent_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        self.fnet = BasicEncoder(
            output_dim=self.latent_dim, stride=self.stride, dtype=self.dtype
        )
        self.delta_block = DeltaBlock1d(
            latent_dim=self.latent_dim, dtype=self.dtype
        )

    def encode_frames(self, rgbs: jnp.ndarray) -> jnp.ndarray:
        x = 2.0 * (rgbs.astype(jnp.float32) / 255.0) - 1.0
        return self.fnet(x.astype(self.dtype))

    def __call__(
        self,
        fmaps: jnp.ndarray,
        coords_init: jnp.ndarray,
        feat_init: Optional[Tuple] = None,
        iters: int = 16,
    ):
        fmaps = jnp.asarray(fmaps)  # scan body indexes with traced frame ids
        s, h8, w8, c = fmaps.shape
        n = coords_init.shape[1]

        coords = coords_init / float(self.stride)
        coords0 = coords[0]

        if feat_init is None:
            feat1 = bilinear_sample(
                fmaps[0], coords0[:, 0], coords0[:, 1], pad_mode="clamp"
            )  # [N, C]
            feats1 = jnp.broadcast_to(feat1[None], (s, n, c))
            feats2 = feats1
            feats4 = feats1
        else:
            feats1, feats2, feats4 = feat_init

        pyr1 = correlation_pyramid(fmaps, feats1, self.corr_levels)

        def sample_delayed_feats(coords, delay):
            idx = jnp.maximum(jnp.arange(s) - delay, 0)
            coords_d = coords[idx]  # [S, N, 2]
            fmaps_d = fmaps[idx]
            return jax.vmap(
                lambda fm, cc: bilinear_sample(
                    fm, cc[:, 0], cc[:, 1], pad_mode="clamp"
                )
            )(fmaps_d, coords_d)  # [S, N, C]

        # Weight-shared iterations run as nn.scan (one traced copy of the
        # 1D-conv DeltaBlock instead of `iters`); the reference's
        # first-iteration special case (keep the provided feats2/feats4,
        # pips_plus_plus.py itr>=1 guard) becomes a per-iteration select on
        # a scanned boolean — both operands are cheap bilinear samples.
        def refine_step(mdl, carry, resample):
            coords, feats2, feats4 = carry
            feats2 = jnp.where(
                resample, sample_delayed_feats(coords, 2), feats2)
            feats4 = jnp.where(
                resample, sample_delayed_feats(coords, 4), feats4)
            pyr2 = correlation_pyramid(fmaps, feats2, mdl.corr_levels)
            pyr4 = correlation_pyramid(fmaps, feats4, mdl.corr_levels)

            fc1 = sample_corr_pyramid(pyr1, coords, mdl.corr_radius)
            fc2 = sample_corr_pyramid(pyr2, coords, mdl.corr_radius)
            fc4 = sample_corr_pyramid(pyr4, coords, mdl.corr_radius)
            fcorr = jnp.concatenate([fc1, fc2, fc4], axis=-1)  # [S, N, 3*LRR]

            flows = coords[1:] - coords[:-1]
            flows = jnp.concatenate([flows, flows[-1:]], axis=0)  # [S, N, 2]

            delta = mdl.delta_block(
                jnp.swapaxes(fcorr, 0, 1), jnp.swapaxes(flows, 0, 1)
            )  # [N, S, 2]
            coords = coords + jnp.swapaxes(delta, 0, 1)
            coords = coords.at[0].set(coords0)  # lock the query frame
            return (coords, feats2, feats4), None

        scan = nn.scan(
            refine_step,
            variable_broadcast="params",
            split_rngs={"params": False},
        )
        resample = jnp.arange(iters) >= 1
        (coords, feats2, feats4), _ = scan(
            self, (coords, feats2, feats4), resample
        )

        return coords * float(self.stride), (feats1, feats2, feats4)
