"""RAFT optical flow, TPU-native.

Re-implements the reference's vendored RAFT core
(sam_pt/point_tracker/raft/raft_core/*: BasicEncoder extractor, all-pairs
CorrBlock corr.py:15-64, SepConvGRU update.py, convex upsampling) as
Flax/JAX:

  - all-pairs correlation is one einsum on the MXU; the (2r+1)^2 pyramid
    lookup uses the separable hat-weight matmul (no gathers);
  - the recurrent update loop is a static unroll under one jit;
  - convex upsampling extracts 3x3 patches via conv_general_dilated_patches;
  - BatchNorm (context encoder) runs in inference mode with running stats as
    parameters (checkpoint-supplied).

Configuration matches raft-things.pth: fdim 256, context 128+128, 4 corr
levels, radius 4, hidden 128.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..pips.model import instance_norm
from ....ops.sampling import separable_neighborhood_sample


class InferenceBatchNorm(nn.Module):
    """BatchNorm2d in eval mode: running stats stored as parameters."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return (x - mean) * inv + bias


class RaftResBlock(nn.Module):
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Any = jnp.float32

    def _norm(self, name):
        if self.norm_fn == "batch":
            return InferenceBatchNorm(self.planes, name=name)
        if self.norm_fn == "instance":
            return lambda x: instance_norm(x)
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        norm1 = self._norm("norm1")
        norm2 = self._norm("norm2")
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(norm1(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(y)
        y = nn.relu(norm2(y))
        if self.stride != 1:
            norm3 = self._norm("norm3")
            x = nn.Conv(self.planes, (1, 1),
                        strides=(self.stride, self.stride),
                        name="downsample", dtype=self.dtype)(x)
            x = norm3(x)
        return nn.relu(x + y)


class RaftEncoder(nn.Module):
    """RAFT feature/context encoder: [B, H, W, 3] -> [B, H/8, W/8, out]."""

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm1 = (
            InferenceBatchNorm(64, name="norm1")
            if self.norm_fn == "batch" else (lambda v: instance_norm(v))
        )
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, name="conv1",
                    dtype=self.dtype)(x)
        x = nn.relu(norm1(x))
        for li, (planes, stride) in enumerate(((64, 1), (96, 2), (128, 2)), 1):
            x = RaftResBlock(planes, self.norm_fn, stride,
                             name=f"layer{li}_0", dtype=self.dtype)(x)
            x = RaftResBlock(planes, self.norm_fn, 1,
                             name=f"layer{li}_1", dtype=self.dtype)(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2",
                       dtype=self.dtype)(x)


def all_pairs_correlation(f1: jnp.ndarray, f2: jnp.ndarray, num_levels: int):
    """[B, h, w, C] x2 -> pyramid of [B, h*w, h_l, w_l] (scaled 1/sqrt(C))."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bxyc,buvc->bxyuv", f1, f2) / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(b, h * w, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        hh, ww = corr.shape[2:]
        corr = nn.avg_pool(
            corr.reshape(b * h * w, hh, ww, 1), (2, 2), strides=(2, 2)
        ).reshape(b, h * w, hh // 2, ww // 2)
        pyramid.append(corr)
    return pyramid


def lookup_correlation(pyramid, coords: jnp.ndarray, radius: int):
    """coords [B, h, w, 2] grid coords -> features [B, h, w, L*(2r+1)^2]."""
    b, h, w, _ = coords.shape
    d = jnp.linspace(-radius, radius, 2 * radius + 1)
    flat = coords.reshape(b, h * w, 2)
    outs = []
    for lvl, corr in enumerate(pyramid):
        centers = flat / (2.0 ** lvl)
        patch = separable_neighborhood_sample(
            corr, centers[..., 0], centers[..., 1], d, d, zero_pad=True
        )  # [B, hw, Ky, Kx]
        # The reference flattens lookup windows x-major: CorrBlock.__call__
        # adds meshgrid row offsets to x (raft_core/corr.py:40-46), and the
        # trained motion-encoder weights consume that order.
        patch = jnp.swapaxes(patch, -1, -2)
        outs.append(patch.reshape(b, h, w, -1))
    return jnp.concatenate(outs, axis=-1)


class SepConvGRU(nn.Module):
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (1, 5), padding=(0, 2),
                               name="convz1", dtype=self.dtype)(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, (1, 5), padding=(0, 2),
                               name="convr1", dtype=self.dtype)(hx))
        q = nn.tanh(nn.Conv(self.hidden, (1, 5), padding=(0, 2),
                            name="convq1", dtype=self.dtype)(
            jnp.concatenate([r * h, x], axis=-1)))
        h = (1 - z) * h + z * q

        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (5, 1), padding=(2, 0),
                               name="convz2", dtype=self.dtype)(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, (5, 1), padding=(2, 0),
                               name="convr2", dtype=self.dtype)(hx))
        q = nn.tanh(nn.Conv(self.hidden, (5, 1), padding=(2, 0),
                            name="convq2", dtype=self.dtype)(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    corr_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), name="convc1", dtype=self.dtype)(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, name="convc2",
                            dtype=self.dtype)(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, name="convf1",
                            dtype=self.dtype)(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, name="convf2",
                            dtype=self.dtype)(f))
        out = nn.relu(nn.Conv(126, (3, 3), padding=1, name="conv",
                              dtype=self.dtype)(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128


class BasicUpdateBlock(nn.Module):
    hidden: int = 128
    corr_channels: int = 4 * 81
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_channels, name="encoder",
                                    dtype=self.dtype)(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden, name="gru", dtype=self.dtype)(net, x)
        d = nn.relu(nn.Conv(256, (3, 3), padding=1, name="flow_head_conv1",
                            dtype=self.dtype)(net))
        delta_flow = nn.Conv(2, (3, 3), padding=1, name="flow_head_conv2",
                             dtype=self.dtype)(d)
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, name="mask_conv1",
                            dtype=self.dtype)(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), name="mask_conv2",
                              dtype=self.dtype)(m)
        return net, mask, delta_flow


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, 2] coarse flow + [B, h, w, 64*9] weights -> [B, 8h, 8w, 2]."""
    b, h, w, _ = flow.shape
    # channel layout follows the torch reference's mask.view(N, 1, 9, 8, 8,
    # H, W) (raft_core/raft.py:78): the 9 convex weights are the SLOWEST-
    # varying channel group, then the 8x8 subpixel offsets
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    patches = jax.lax.conv_general_dilated_patches(
        (8.0 * flow).transpose(0, 3, 1, 2),  # NCHW
        filter_shape=(3, 3), window_strides=(1, 1), padding="SAME",
    )  # [B, 2*9, h, w]
    patches = patches.reshape(b, 2, 9, h, w).transpose(0, 3, 4, 1, 2)

    up = jnp.einsum("bhwkuv,bhwck->bhwuvc", mask, patches)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)
    return up


class Raft(nn.Module):
    corr_levels: int = 4
    corr_radius: int = 4
    hidden: int = 128
    context: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.fnet = RaftEncoder(256, "instance", name="fnet", dtype=self.dtype)
        self.cnet = RaftEncoder(self.hidden + self.context, "batch",
                                name="cnet", dtype=self.dtype)
        self.update_block = BasicUpdateBlock(
            self.hidden, self.corr_levels * (2 * self.corr_radius + 1) ** 2,
            name="update_block", dtype=self.dtype,
        )

    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray,
                 iters: int = 32) -> jnp.ndarray:
        """images [B, H, W, 3] in [-1, 1], H/W multiples of 8 -> flow [B, H, W, 2]."""
        b, h, w, _ = image1.shape
        h8, w8 = h // 8, w // 8

        f1 = self.fnet(image1)
        f2 = self.fnet(image2)
        pyramid = all_pairs_correlation(f1, f2, self.corr_levels)

        cnet = self.cnet(image1)
        net = jnp.tanh(cnet[..., : self.hidden])
        inp = nn.relu(cnet[..., self.hidden :])

        gy, gx = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                              jnp.arange(w8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(
            jnp.stack([gx, gy], axis=-1)[None], (b, h8, w8, 2)
        )
        coords1 = coords0

        # The ConvGRU iterations share weights -> nn.scan with params
        # broadcast (one iteration in the traced graph instead of 32), and
        # the convex upsample runs ONCE on the final flow — the reference
        # upsamples every iteration (raft.py training supervision) but only
        # the last flow is returned at inference.
        mask0 = jnp.zeros((b, h8, w8, 8 * 8 * 9), jnp.float32)

        def update_step(mdl, carry, _):
            net, coords1, _ = carry
            corr = lookup_correlation(pyramid, coords1, mdl.corr_radius)
            flow = coords1 - coords0
            net, mask, delta = mdl.update_block(net, inp, corr, flow)
            return (net, coords1 + delta, mask), None

        scan = nn.scan(
            update_step,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=iters,
        )
        (net, coords1, mask), _ = scan(self, (net, coords1, mask0), None)
        return convex_upsample(coords1 - coords0, mask)
