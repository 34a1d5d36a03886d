"""TinyViT image encoder (MobileSAM), TPU-native.

Re-implements the `mobile_sam` TinyViT-5M encoder consumed by the reference
(SURVEY.md §2.9; dims from configs/model/sam/sam_mobile_vit_tiny.yaml:
embed_dims [64, 128, 160, 320], depths [2, 2, 6, 2], heads [2, 4, 5, 10],
windows [7, 7, 14, 7]): a conv stem (/4), one MBConv stage, then three
window-attention stages with LeViT-style learned attention biases, patch
merging between stages — with the MobileSAM twist that the final merge uses
stride 1 so the output grid stays 64x64 at 1024 input, followed by the SAM
neck to 256 channels.

Inference-mode BatchNorm: running statistics are parameters ('mean', 'var')
applied directly — this is an inference framework and conversion from the
public checkpoint carries the stats (utils/checkpoint.py).
"""
from __future__ import annotations

import functools
import itertools
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.fast_ln import exact_gelu
import numpy as np

from .image_encoder import LayerNorm2d


class ConvBN(nn.Module):
    """Conv2d + inference BatchNorm (torch Conv2d_BN)."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, feature_group_count=self.groups,
            use_bias=False, name="conv", dtype=self.dtype,
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return (x - mean) * inv + bias


class MBConv(nn.Module):
    features: int
    expand_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(x.shape[-1] * self.expand_ratio)
        y = ConvBN(hidden, name="conv1", dtype=self.dtype)(x)
        y = exact_gelu(y)
        y = ConvBN(hidden, (3, 3), padding=1, groups=hidden, name="conv2",
                   dtype=self.dtype)(y)
        y = exact_gelu(y)
        y = ConvBN(self.features, name="conv3", dtype=self.dtype)(y)
        return exact_gelu(x + y)


class PatchMerging(nn.Module):
    """1x1 expand -> 3x3 depthwise (stride 2, or 1 for the 320-dim stage) ->
    1x1 project (the MobileSAM stride trick keeps 64x64 output)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        stride = 1 if self.out_dim in (320, 448, 576) else 2
        y = ConvBN(self.out_dim, name="conv1", dtype=self.dtype)(x)
        y = exact_gelu(y)
        y = ConvBN(self.out_dim, (3, 3), strides=(stride, stride), padding=1,
                   groups=self.out_dim, name="conv2", dtype=self.dtype)(y)
        y = exact_gelu(y)
        return ConvBN(self.out_dim, name="conv3", dtype=self.dtype)(y)


@functools.lru_cache(maxsize=None)
def _rel_bias_index(window: int) -> np.ndarray:
    """LeViT-style: map each (query, key) offset pair to a unique bias slot.

    Cached: the O(L^2) python table is built once per window size per
    process instead of twice per block per trace."""
    points = list(itertools.product(range(window), range(window)))
    offsets = {}
    idxs = np.zeros((len(points), len(points)), np.int64)
    for i, p1 in enumerate(points):
        for j, p2 in enumerate(points):
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs[i, j] = offsets[off]
    return idxs


class TinyAttention(nn.Module):
    """LeViT attention: separate q/k dim and wider v, learned attn biases."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, L, C] with L == window^2
        b, l, c = x.shape
        nh = self.num_heads
        kd = self.key_dim
        vd = int(self.attn_ratio * kd)
        h = nh * (2 * kd + vd)

        x = nn.LayerNorm(name="norm", dtype=self.dtype)(x)
        qkv = nn.Dense(h, name="qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(b, l, nh, 2 * kd + vd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))

        n_slots = int(_rel_bias_index(self.window).max()) + 1
        biases = self.param(
            "attention_biases", nn.initializers.zeros, (nh, n_slots)
        )
        idx = jnp.asarray(_rel_bias_index(self.window))
        bias = biases[:, idx]  # [nh, L, L]

        attn = (q @ jnp.swapaxes(k, -1, -2)) * (kd ** -0.5) + bias[None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        out = attn @ v  # [B, nh, L, vd]
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, l, nh * vd)
        return nn.Dense(self.dim, name="proj", dtype=self.dtype)(out)


class TinyViTBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        win = self.window
        shortcut = x

        pad_h = (win - h % win) % win
        pad_w = (win - w % win) % win
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        x = x.reshape(b, hp // win, win, wp // win, win, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, win * win, c)

        x = TinyAttention(
            dim=c, key_dim=c // self.num_heads, num_heads=self.num_heads,
            attn_ratio=1.0,  # TinyViTBlock uses attn_ratio=1 (LeViT default 4)
            window=win, name="attn", dtype=self.dtype,
        )(x)

        x = x.reshape(b, hp // win, wp // win, win, win, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)
        x = x[:, :h, :w]
        x = shortcut + x

        # local depthwise conv
        y = ConvBN(c, (3, 3), padding=1, groups=c, name="local_conv",
                   dtype=self.dtype)(x)
        x = y  # torch applies local_conv in place on the residual stream

        shortcut = x
        y = nn.LayerNorm(name="mlp_norm", dtype=self.dtype)(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1",
                     dtype=self.dtype)(y)
        y = exact_gelu(y)
        y = nn.Dense(c, name="mlp_fc2", dtype=self.dtype)(y)
        return shortcut + y


class TinyViT(nn.Module):
    """TinyViT-5M for MobileSAM: 1024x1024x3 -> 64x64x256."""

    img_size: int = 1024
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    out_chans: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_interm: bool = False):
        # [B, H, W, 3] normalized. For Light HQ-SAM, `interm` is the pre-neck
        # 320-d stage output at the 64x64 grid (documented assumption — the
        # ViT variants use the first global-attention block output instead).
        d = self.dtype
        # stem: two stride-2 ConvBN+GELU -> /4
        x = ConvBN(self.embed_dims[0] // 2, (3, 3), strides=(2, 2), padding=1,
                   name="patch_embed_conv1", dtype=d)(x)
        x = exact_gelu(x)
        x = ConvBN(self.embed_dims[0], (3, 3), strides=(2, 2), padding=1,
                   name="patch_embed_conv2", dtype=d)(x)

        # stage 0: MBConv
        for i in range(self.depths[0]):
            x = MBConv(self.embed_dims[0], name=f"stage0_block{i}", dtype=d)(x)

        # stages 1..3: merge + transformer blocks
        for s in range(1, 4):
            x = PatchMerging(self.embed_dims[s], name=f"merge{s}", dtype=d)(x)
            for i in range(self.depths[s]):
                x = TinyViTBlock(
                    dim=self.embed_dims[s],
                    num_heads=self.num_heads[s],
                    window=self.window_sizes[s],
                    mlp_ratio=self.mlp_ratio,
                    name=f"stage{s}_block{i}",
                    dtype=d,
                )(x)

        interm = x  # pre-neck stage-3 features

        # SAM neck
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1",
                    dtype=d)(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2", dtype=d)(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        if return_interm:
            return x, interm
        return x
