"""PIPS (Persistent Independent Particles) point-tracking model, TPU-native.

Re-implements the architecture of the reference's in-repo PIPS
(sam_pt/point_tracker/pips/pips.py: BasicEncoder :191, CorrBlock :344,
DeltaBlock/MLPMixer :116+290, refinement loop :507-568) as Flax/JAX with
TPU-first choices:

  - NHWC convs throughout; instance norm as channel-per-group GroupNorm.
  - The model consumes PRECOMPUTED per-frame feature maps: the encoder runs
    once per video (batched over frames) instead of once per 8-frame window
    per linking step as in the reference (pips.py:453-455) — an ~S-fold
    compute saving on the CNN.
  - Correlation pyramids are einsum matmuls; neighborhood sampling uses the
    separable hat-weight matmul (ops.sampling) rather than gathers.
  - The 6-iteration refinement is an unrolled static loop inside one jit.

Weight layout mirrors the reference checkpoints for conversion
(utils/checkpoint.py): latent_dim 128, hidden 512 mixer, depth 12, S=8,
corr_levels 4, corr_radius 3.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ....ops.resize import resize_bilinear
from ....ops.sampling import bilinear_sample, separable_neighborhood_sample
from ....ops.posemb import get_3d_sincos_embedding


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) on NHWC: normalize each channel over H, W."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        name="downsample", dtype=self.dtype)(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Multi-scale CNN: frame [H, W, 3] in [-1, 1] -> fmap [H/stride, W/stride, C].

    Four residual stages at strides 2/4/8/16 are upsampled (align_corners=True,
    matching reference pips.py:275-278) to H/stride and fused.
    """

    output_dim: int = 128
    stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        target = (h // self.stride, w // self.stride)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, name="conv1",
                    dtype=self.dtype)(x)
        x = nn.relu(instance_norm(x))

        def stage(x, planes, stride, idx):
            x = ResidualBlock(planes, stride, name=f"layer{idx}_0",
                              dtype=self.dtype)(x)
            return ResidualBlock(planes, 1, name=f"layer{idx}_1",
                                 dtype=self.dtype)(x)

        a = stage(x, 64, 1, 1)
        b = stage(a, 96, 2, 2)
        c = stage(b, 128, 2, 3)
        d = stage(c, 128, 2, 4)

        feats = [
            resize_bilinear(t, target, align_corners=True)
            for t in (a, b, c, d)
        ]
        x = jnp.concatenate(feats, axis=-1)
        x = nn.Conv(self.output_dim * 2, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(x)
        x = nn.relu(instance_norm(x))
        return nn.Conv(self.output_dim, (1, 1), name="conv3", dtype=self.dtype)(x)


class MixerBlock(nn.Module):
    """One MLP-Mixer block: token-mix over S, then channel-mix over C."""

    seq_len: int
    dim: int
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, S, C]
        y = nn.LayerNorm(name="token_norm", dtype=self.dtype)(x)
        y = jnp.swapaxes(y, -1, -2)  # [B, C, S]
        y = nn.Dense(self.seq_len * self.expansion, name="token_fc1",
                     dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.seq_len, name="token_fc2", dtype=self.dtype)(y)
        x = x + jnp.swapaxes(y, -1, -2)

        y = nn.LayerNorm(name="chan_norm", dtype=self.dtype)(x)
        y = nn.Dense(self.dim * self.expansion, name="chan_fc1",
                     dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="chan_fc2", dtype=self.dtype)(y)
        return x + y


class DeltaBlock(nn.Module):
    """MLP-Mixer that maps per-point window state to (coord, feature) deltas.

    Input per point: [S, corr_levels*(2r+1)^2 + latent + 64*3+3]; output
    [S, latent + 2] (reference pips.py:290-317).
    """

    latent_dim: int = 128
    hidden_dim: int = 512
    depth: int = 12
    s: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fhid, fcorr, flow):  # [B, S, C], [B, S, LRR], [B, S, 3]
        flow_emb = get_3d_sincos_embedding(flow, 64, cat_coords=True)
        x = jnp.concatenate([fhid, fcorr, flow_emb], axis=-1)

        x = nn.Dense(self.hidden_dim, name="input_proj", dtype=self.dtype)(x)
        for i in range(self.depth):
            x = MixerBlock(self.s, self.hidden_dim, name=f"mixer_{i}",
                           dtype=self.dtype)(x)
        x = nn.LayerNorm(name="out_norm", dtype=self.dtype)(x)
        x = x.mean(axis=1)  # [B, C]
        x = nn.Dense(self.s * (self.latent_dim + 2), name="out_proj",
                     dtype=self.dtype)(x)
        return x.reshape(x.shape[0], self.s, self.latent_dim + 2)


def correlation_pyramid(
    fmaps: jnp.ndarray, targets: jnp.ndarray, num_levels: int
) -> Sequence[jnp.ndarray]:
    """Multi-scale correlation volumes as MXU matmuls.

    fmaps: [S, H, W, C] window feature maps; targets: [S, N, C] per-point
    features. Returns [corr_l: [S, N, H_l, W_l]] for each pyramid level
    (avg-pooled fmaps), scaled by 1/sqrt(C) (reference pips.py:393-407).
    """
    s, h, w, c = fmaps.shape
    out = []
    fm = fmaps
    for lvl in range(num_levels):
        hw = fm.shape[1] * fm.shape[2]
        corr = jnp.einsum(
            "snc,shwc->snhw", targets, fm,
        ) / jnp.sqrt(jnp.float32(c)).astype(targets.dtype)
        out.append(corr)
        if lvl < num_levels - 1:
            fm = nn.avg_pool(fm, (2, 2), strides=(2, 2))
    return out


def sample_corr_pyramid(
    pyramid: Sequence[jnp.ndarray], coords: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Sample (2r+1)^2 neighborhoods from each level around coords/2^level.

    pyramid[l]: [S, N, H_l, W_l]; coords: [S, N, 2]. Returns [S, N, L*(2r+1)^2].
    Uses the separable hat-weight matmul (zero padding + align_corners grid
    conventions of reference pips.py:364-391).
    """
    d = jnp.linspace(-radius, radius, 2 * radius + 1)
    outs = []
    for lvl, corr in enumerate(pyramid):
        centers = coords / (2.0 ** lvl)
        patch = separable_neighborhood_sample(
            corr, centers[..., 0], centers[..., 1], d, d, zero_pad=True
        )  # [S, N, Ky, Kx]
        # The reference flattens each window x-major: CorrBlock.sample builds
        # delta = stack(meshgrid(dy, dx, 'ij')) and adds delta[..., 0] (the
        # ROW index) to x (pips.py:376-385), so flat index (i, j) is the tap
        # at (x + d[i], y + d[j]). The trained mixer weights consume that
        # order, so transpose before flattening.
        patch = jnp.swapaxes(patch, -1, -2)
        outs.append(patch.reshape(*patch.shape[:2], -1))
    return jnp.concatenate(outs, axis=-1)


class Pips(nn.Module):
    """PIPS window model over precomputed feature maps.

    forward(fmaps [S, H8, W8, C], xys [N, 2], feat_init [N, C] | None)
      -> (coords [S, N, 2] in pixels, vis_logits [S, N], ffeat0 [N, C])

    Iterative refinement: per iteration, build the correlation pyramid from
    current per-frame point features, sample neighborhoods around current
    coords, run the mixer to get coordinate/feature deltas
    (reference pips.py:507-568). Frame-0 coords stay locked to the query.
    """

    s: int = 8
    stride: int = 8
    latent_dim: int = 128
    hidden_dim: int = 512
    corr_levels: int = 4
    corr_radius: int = 3
    mixer_depth: int = 12
    dtype: Any = jnp.float32

    def setup(self):
        self.fnet = BasicEncoder(
            output_dim=self.latent_dim, stride=self.stride, dtype=self.dtype
        )
        self.delta_block = DeltaBlock(
            latent_dim=self.latent_dim,
            hidden_dim=self.hidden_dim,
            depth=self.mixer_depth,
            s=self.s,
            dtype=self.dtype,
        )
        # torch GroupNorm(1, C) on flattened [B*N*S, C] rows == LayerNorm over
        # the channel axis with eps 1e-5 (biased variance, per-channel affine).
        self.ffeat_norm = nn.LayerNorm(epsilon=1e-5, name="ffeat_norm",
                                       dtype=self.dtype)
        self.ffeat_updater = nn.Dense(self.latent_dim, name="ffeat_updater",
                                      dtype=self.dtype)
        self.vis_predictor = nn.Dense(1, name="vis_predictor", dtype=self.dtype)

    def encode_frames(self, rgbs: jnp.ndarray) -> jnp.ndarray:
        """rgbs [T, H, W, 3] uint8/float 0-255 -> fmaps [T, H/stride, W/stride, C]."""
        x = 2.0 * (rgbs.astype(jnp.float32) / 255.0) - 1.0
        return self.fnet(x.astype(self.dtype))

    def __call__(
        self,
        fmaps: jnp.ndarray,            # [S, H8, W8, C]
        xys: jnp.ndarray,              # [N, 2] pixel coords at window frame 0
        feat_init: Optional[jnp.ndarray] = None,  # [N, C]
        iters: int = 6,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        s, h8, w8, c = fmaps.shape
        n = xys.shape[0]
        assert s == self.s

        coords0 = xys / float(self.stride)  # grid coords
        coords = jnp.broadcast_to(coords0[None], (s, n, 2))

        if feat_init is None:
            ffeat0 = bilinear_sample(
                fmaps[0], coords0[:, 0], coords0[:, 1], pad_mode="clamp"
            )  # [N, C]
        else:
            ffeat0 = feat_init
        ffeats = jnp.broadcast_to(ffeat0[None], (s, n, c))

        # Refinement iterations share weights, so they run as nn.scan with
        # params broadcast — the traced graph holds ONE iteration instead of
        # `iters` copies of the 12-deep mixer. (The unrolled form compiled
        # in ~13 min through the remote TPU toolchain inside the linking
        # while-loop; identical numerics, verified by the torch parity
        # tests.)
        def refine_step(mdl, carry, _):
            coords, ffeats = carry
            pyramid = correlation_pyramid(fmaps, ffeats, mdl.corr_levels)
            fcorrs = sample_corr_pyramid(pyramid, coords, mdl.corr_radius)

            # mixer operates per point: [N, S, *]
            fcorrs_p = jnp.swapaxes(fcorrs, 0, 1)
            flows_p = jnp.swapaxes(coords - coords[0:1], 0, 1)  # [N, S, 2]
            times = jnp.broadcast_to(
                jnp.linspace(0.0, float(s), s)[None, :, None], (n, s, 1)
            )
            flows_p = jnp.concatenate([flows_p, times], axis=-1)
            ffeats_p = jnp.swapaxes(ffeats, 0, 1)  # [N, S, C]

            delta = mdl.delta_block(ffeats_p, fcorrs_p, flows_p)  # [N, S, C+2]
            delta_coords = jnp.swapaxes(delta[..., :2], 0, 1)  # [S, N, 2]
            delta_feats = delta[..., 2:]  # [N, S, C]

            # feature update: GELU(Linear(norm(delta))) + ffeats
            # (reference pips.py:428-431, 536-538)
            upd = nn.gelu(
                mdl.ffeat_updater(mdl.ffeat_norm(delta_feats)),
                approximate=False,
            )
            ffeats = jnp.swapaxes(upd, 0, 1) + ffeats

            coords = coords + delta_coords
            coords = coords.at[0].set(coords0)  # lock query frame
            return (coords, ffeats), None

        scan = nn.scan(
            refine_step,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=iters,
        )
        (coords, ffeats), _ = scan(self, (coords, ffeats), None)

        vis_logits = self.vis_predictor(ffeats)[..., 0]  # [S, N]
        return coords * float(self.stride), vis_logits, ffeat0
