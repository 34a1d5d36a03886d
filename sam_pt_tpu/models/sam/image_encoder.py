"""SAM ViT-det image encoder, TPU-native.

Re-implements the architecture consumed by the reference through the external
`segment_anything` package (SURVEY.md §2.9; dims wired from
configs/model/sam/image_encoder/vit_base.yaml: depth 12/24/32, embed
768/1024/1280, window 14, designated global-attention layers), as a Flax
module designed for XLA/TPU:

  - NHWC layout end-to-end; the token grid stays [B, H, W, C] and window
    partitioning is a reshape/transpose (no gathers).
  - Decomposed relative-position attention is computed with einsums against
    the interpolated rel-pos tables — matmuls on the MXU, not gathers.
  - A configurable compute dtype (bf16 by default on TPU) with f32 softmax
    accumulation; parameters stay f32.
  - All shapes static: padding for the 14-window partition of the 64x64 token
    grid is baked at trace time.

Weight compatibility: parameter tree mirrors the original SAM checkpoint
structure 1:1 (see utils/checkpoint.py for the torch->flax key mapping), so
public sam_vit_{b,l,h}.pth checkpoints convert losslessly.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ...ops.fast_ln import FastLayerNorm, fast_gelu

# Canonical SAM encoder variants (embed_dim, depth, num_heads, global_attn_layers)
VIT_VARIANTS = {
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12,
                  global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16,
                  global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16,
                  global_attn_indexes=(7, 15, 23, 31)),
}


class PatchEmbed(nn.Module):
    """16x16/stride-16 patch embedding as an explicit reshape + matmul.

    Param tree is identical to the `nn.Conv(name="patch_embed")` it replaces
    (kernel [p, p, C, D], bias [D]) so converters and checkpoints are
    untouched. Non-overlapping stride-p patches make the convolution an
    exact block reshape followed by one [B*G*G, p*p*C] x [p*p*C, D] matmul —
    XLA's conv_general_dilated lowering for this shape measured ~7x slower
    than the plain matmul on the encode trace (3.4 ms vs ~0.5 ms per
    4-frame chunk)."""

    embed_dim: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        gh, gw = h // p, w // p
        x = x.astype(self.dtype)
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh, gw, p * p * c)
        wmat = kernel.astype(self.dtype).reshape(p * p * c, self.embed_dim)
        return x @ wmat + bias.astype(self.dtype)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over the last axis of NHWC maps (SAM 'neck' LN)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * weight + bias).astype(x.dtype)


def _rel_pos_table(rel_pos: jnp.ndarray, q_size: int, k_size: int,
                   cropped: bool = False) -> jnp.ndarray:
    """Select/interpolate the relative position table to [q_size, k_size, head_dim].

    The checkpoint stores rel_pos for max distance (2*size - 1). When q/k sizes
    match the table, this is a static slice-free take; trace-time constants mean
    XLA folds the index arithmetic away.

    `cropped`: the runtime grid is a CROP of the grid the table was sized
    for (pad-token cropping) — take the CENTER of the oversized table (the
    same relative distances the uncropped computation uses) instead of
    resizing it.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if cropped and rel_pos.shape[0] > max_rel_dist:
        c = rel_pos.shape[0] // 2  # distance-0 row
        half = max_rel_dist // 2
        rel_pos = rel_pos[c - half : c + half + 1]
    if rel_pos.shape[0] != max_rel_dist:
        # Linear-resize the table (done once per jit trace; matmul-based).
        from ...ops.resize import resize_bilinear

        table = rel_pos[None, :, :, None]  # [1, L, C, 1]
        table = resize_bilinear(
            table, (max_rel_dist, rel_pos.shape[1]), align_corners=False
        )
        rel_pos = table[0, :, :, 0]
    # relative coordinate index grid (static numpy -> constant folded)
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(rel.astype(np.int64))]  # [q, k, C]


def _add_decomposed_rel_pos(
    attn: jnp.ndarray,
    q: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: Tuple[int, int],
    k_hw: Tuple[int, int],
    cropped: bool = False,
) -> jnp.ndarray:
    """Add decomposed relative position bias to attention logits.

    attn: [B*nh, q_h*q_w, k_h*k_w]; q: [B*nh, q_h*q_w, head_dim].
    bias[h_q, w_q, h_k, w_k] = q . Rh[h_q, h_k] + q . Rw[w_q, w_k]
    computed as two einsums (MXU) instead of gathered adds.
    """
    q_h, q_w = q_hw
    k_h, k_w = k_hw
    rh = _rel_pos_table(rel_pos_h, q_h, k_h, cropped)  # [q_h, k_h, C]
    rw = _rel_pos_table(rel_pos_w, q_w, k_w, cropped)  # [q_w, k_w, C]

    rq = q.reshape(-1, q_h, q_w, q.shape[-1])
    bias_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh.astype(q.dtype))
    bias_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw.astype(q.dtype))
    attn = attn.reshape(-1, q_h, q_w, k_h, k_w)
    attn = attn + bias_h[:, :, :, :, None] + bias_w[:, :, :, None, :]
    return attn.reshape(-1, q_h * q_w, k_h * k_w)


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible parameters (kernel [in, out], bias
    [out]) WITHOUT applying them — the tensor-parallel shard_map attention
    consumes the raw arrays (it slices head blocks per device), but the
    param tree must stay byte-identical to the nn.Dense the XLA path uses
    so checkpoints and the init tree are mode-independent."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class Attention(nn.Module):
    """Multi-head attention over an NHWC token grid with optional rel-pos.

    `padded_head_dim` (global-attention blocks): the qkv/proj/rel-pos
    parameters carry the head dim padded to a lane-aligned size with zeros
    baked into the CONVERTED WEIGHTS (utils/checkpoint.py), so no runtime pad
    op runs and the fused kernel reads q/k/v straight from the qkv
    projection's [B, N, 3, H, Dp] output — no head-split transpose, no bias
    tensors, no augmentation concats in HBM.
    """

    num_heads: int
    use_rel_pos: bool = True
    input_size: Optional[Tuple[int, int]] = None  # (H, W) for rel-pos tables
    padded_head_dim: Optional[int] = None
    fused_window: bool = False  # window kernel at the NATIVE head dim
    cropped: bool = False  # runtime grid is a crop of input_size (pad crop)
    # Tensor parallelism: name of the mesh axis heads are sharded over.
    # At real SAM scale this routes through `tp_shardmap_attention` — the
    # Pallas fused kernels run per head shard inside jax.shard_map (GSPMD
    # cannot partition a custom call, but a shard_map body is a
    # single-device program). When the local head count misaligns with the
    # kernels' lane tiling (or the config is tiny), falls back to the XLA
    # path with a head-sharded layout constraint on the split q/k/v.
    # `dp_axis` names the mesh axis the BATCH is sharded over (if any) so
    # both paths preserve data parallelism on a 2D (data x model) mesh.
    # Requires an active mesh (jax.set_mesh) with d*m dividing
    # batch*num_heads.
    tp_axis: Optional[str] = None
    dp_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # 3D input = token-flat window batch [B*nWin, win*win, C] (span
        # mode); output stays flat. 4D input = [B, H, W, C] grid.
        flat_in = x.ndim == 3
        if flat_in:
            b, n, c = x.shape
            h = w = int(round(n ** 0.5))
            assert h * w == n, (n, "flat attention input must be square")
        else:
            b, h, w, c = x.shape
        head_dim = c // self.num_heads
        hdp = self.padded_head_dim or head_dim
        scale = head_dim ** -0.5  # scale always uses the REAL head dim

        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, hdp)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, hdp)
            )

        # Tensor parallelism through the PALLAS kernels: inside shard_map
        # every device runs a single-device program, so the fused kernels
        # apply per head shard (they are per-head grid-parallel). Engaged
        # when the trace-time mesh has a model axis and the LOCAL head
        # count satisfies the kernels' lane-tiling constraints; otherwise
        # the XLA + sharding-constraint path below remains the fallback.
        tp_m = 0
        if self.tp_axis is not None and self.use_rel_pos:
            am = jax.sharding.get_abstract_mesh()
            shape = dict(am.shape) if am is not None else {}
            tp_m = int(shape.get(self.tp_axis, 0) or 0)
            dp_m = int(shape.get(self.dp_axis, 1) or 1) if self.dp_axis else 1
        if tp_m > 1 and self.num_heads % tp_m == 0 and h * w >= 196:
            hl = self.num_heads // tp_m
            hb = 128 // int(np.gcd(hdp, 128))
            win_ok = h * w < 1024 and h == w and hl % hb == 0 and (
                self.fused_window or hdp % 128 == 0
            )
            glob_ok = h * w >= 1024 and hdp % 128 == 0
            if (win_ok or glob_ok) and b % dp_m == 0:
                from ...parallel.tensor_parallel import tp_shardmap_attention

                qkv_k, qkv_b = _DenseParams(
                    3 * self.num_heads * hdp, name="qkv")(c)
                proj_k, proj_b = _DenseParams(
                    c, name="proj")(self.num_heads * hdp)
                rh = _rel_pos_table(rel_pos_h, h, h, self.cropped)
                rw = _rel_pos_table(rel_pos_w, w, w, self.cropped)
                xf = x if flat_in else x.reshape(b, h * w, c)
                out = tp_shardmap_attention(
                    xf.astype(self.dtype),
                    qkv_k, qkv_b, proj_k, proj_b, rh, rw,
                    heads=self.num_heads, tp_size=tp_m, scale=scale,
                    axis=self.tp_axis, dp_axis=self.dp_axis,
                    kh=h, kw=w, dtype=self.dtype,
                )
                return out if flat_in else out.reshape(b, h, w, c)

        qkv = nn.Dense(3 * self.num_heads * hdp, use_bias=True, name="qkv",
                       dtype=self.dtype)(x)
        qkv = qkv.reshape(b, h * w, 3 * self.num_heads * hdp)

        # Large global blocks (the 4096-token SAM grid) go through the fused
        # Pallas kernel: logits stay in VMEM and the rel-pos bias is computed
        # inside the kernel from the raw tables — no [N, N] HBM logits, no
        # bias tensors, no layout copies. Windowed blocks with lane-padded
        # heads use the window variant (full within-window bias table shared
        # across windows, one batched mat-vec per window) — the round-1
        # grouped kernel that was neutral-to-worse read pre-split q/k/v plus
        # HBM augmentation concats; reading the raw qkv projection removes
        # exactly the traffic it was paying.
        use_fused = (
            self.use_rel_pos and h * w >= 1024 and self.tp_axis is None
        )
        # The window kernel treats each batch element as one square window
        # (win*win == n assert) — window blocks are always square, and a
        # SQUARE cropped global grid is exactly one such window, but a
        # rectangular cropped global grid (< 1024 tokens, e.g. very wide
        # frames under crop_pad_tokens) must fall through to the naive path.
        use_fused_win = (
            self.use_rel_pos and h * w < 1024 and h == w
            and self.tp_axis is None
            and (self.fused_window
                 or (self.padded_head_dim is not None and hdp % 128 == 0))
        )
        if use_fused_win:
            from ...ops.flash_attention import fused_qkv_window_attention

            rh = _rel_pos_table(rel_pos_h, h, h, self.cropped)  # [h, h, hdp]
            rw = _rel_pos_table(rel_pos_w, w, w, self.cropped)
            out = fused_qkv_window_attention(
                qkv, rh.astype(qkv.dtype), rw.astype(qkv.dtype),
                scale=scale, heads=self.num_heads,
            )  # [BW, N, H*hdp]
            if not flat_in:
                out = out.reshape(b, h, w, self.num_heads * hdp)
        elif use_fused and hdp % 128 == 0:
            from ...ops.flash_attention import fused_qkv_relpos_attention

            rh = _rel_pos_table(rel_pos_h, h, h, self.cropped)  # [h, h, hdp]
            rw = _rel_pos_table(rel_pos_w, w, w, self.cropped)
            out = fused_qkv_relpos_attention(
                qkv, rh.astype(qkv.dtype), rw.astype(qkv.dtype),
                scale=scale, kh=h, kw=w, heads=self.num_heads,
            )  # [B, N, H*hdp]
            if not flat_in:
                out = out.reshape(b, h, w, self.num_heads * hdp)
        elif use_fused:
            # lane-unaligned head dim (direct Attention use without padded
            # converted weights): older augmented-matmul kernel, pads at
            # runtime
            from ...ops.flash_attention import fused_relpos_attention

            qkv = qkv.reshape(b, h * w, 3, self.num_heads, hdp)
            qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4)).reshape(
                3, b * self.num_heads, h * w, hdp)
            q, k, v = qkv[0], qkv[1], qkv[2]
            rh = _rel_pos_table(rel_pos_h, h, h, self.cropped)
            rw = _rel_pos_table(rel_pos_w, w, w, self.cropped)
            rq = q.reshape(-1, h, w, hdp)
            bias_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh.astype(q.dtype))
            bias_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw.astype(q.dtype))
            out = fused_relpos_attention(
                q, k, v,
                bias_h.reshape(-1, h * w, h),
                bias_w.reshape(-1, h * w, w),
                scale=scale,
            )
            out = out.reshape(b, self.num_heads, h * w, hdp)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(
                b, h * w, self.num_heads * hdp)
            if not flat_in:
                out = out.reshape(b, h, w, self.num_heads * hdp)
        else:
            qkv = qkv.reshape(b, h * w, 3, self.num_heads, hdp)
            qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4)).reshape(
                3, b * self.num_heads, h * w, hdp)
            if self.tp_axis is not None:
                # Head-shard the split q/k/v: the qkv projection arrives
                # replicated (its kernel is contraction-dim sharded and
                # psum'ed — see parallel/tensor_parallel.py), so this
                # constraint is a local slice, and every per-head op below
                # (logits, rel-pos bias einsums, softmax, @v) inherits it.
                from jax.sharding import PartitionSpec as _P

                merged = tuple(
                    a for a in (self.dp_axis, self.tp_axis) if a is not None
                )
                qkv = jax.lax.with_sharding_constraint(
                    qkv, _P(None, merged, None, None)
                )
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * scale) @ jnp.swapaxes(k, -2, -1)
            if self.use_rel_pos:
                attn = _add_decomposed_rel_pos(
                    attn, q, rel_pos_h, rel_pos_w, (h, w), (h, w),
                    self.cropped,
                )
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = attn @ v
            out = out.reshape(b, self.num_heads, h * w, hdp)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(
                b, h * w, self.num_heads * hdp)
            if not flat_in:
                out = out.reshape(b, h, w, self.num_heads * hdp)
        return nn.Dense(c, name="proj", dtype=self.dtype)(out)


def window_partition(
    x: jnp.ndarray, window: int, flat: bool = False
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] -> [B * nWin, win, win, C] with zero padding; returns padded HW.

    `flat=True` returns [B * nWin, win*win, C] instead (span mode): keeping
    the residual stream token-flat across a span avoids a per-block relayout
    copy — the (win, win) minor dims tile as (8, 128) with win=14 padded to
    16 sublanes, so every [.., 14, 14, C] -> [.., 196, C] reshape at the qkv
    projection was a real 0.5 ms copy per block on the encode trace.
    """
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    if flat:
        return x.reshape(-1, window * window, c), (hp, wp)
    return x.reshape(-1, window, window, c), (hp, wp)


def _window_pad_mask(
    batch: int, hw: Tuple[int, int], padded_hw: Tuple[int, int], window: int,
    flat: bool = False,
) -> Optional[jnp.ndarray]:
    """[B*nWin, win, win, 1] constant: 1 on real tokens, 0 on padding slots
    ([B*nWin, win*win, 1] when `flat`).

    None when the grid divides evenly (no padding). Built in numpy at trace
    time, so XLA constant-folds it and fuses the masking multiply.
    """
    h, w = hw
    hp, wp = padded_hw
    if (hp, wp) == (h, w):
        return None
    real = np.zeros((hp, wp), np.float32)
    real[:h, :w] = 1.0
    m = real.reshape(hp // window, window, wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window, window, 1)
    m = np.tile(m, (batch, 1, 1, 1))
    if flat:
        m = m.reshape(-1, window * window, 1)
    return jnp.asarray(m)


def window_unpartition(
    x: jnp.ndarray, window: int, padded_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of window_partition (4D or flat 3D input), cropping padding."""
    hp, wp = padded_hw
    h, w = hw
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    return x[:, :h, :w, :]


class Block(nn.Module):
    """ViT-det block: (windowed) rel-pos attention + MLP, pre-norm residual.

    Two windowed modes:
      - self-contained (`pre_windowed=False`): partition/unpartition inside
        the block (the layout of the original SAM block);
      - span mode (`pre_windowed=True`): `x` arrives ALREADY partitioned
        ([B*nWin, win, win, C]) and stays partitioned. The caller keeps the
        residual stream in window layout across a whole run of consecutive
        windowed blocks, paying the partition transpose once per span instead
        of twice per block. `pad_mask` zeroes the padding slots of the
        attention input, which reproduces the original zero-padded windows
        exactly (LayerNorm and the MLP are per-token, so real-token outputs
        are bit-identical to the per-block layout).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0  # 0 = global attention
    input_size: Optional[Tuple[int, int]] = None
    pre_windowed: bool = False
    padded_head_dim: Optional[int] = None
    fused_window: bool = False
    cropped: bool = False
    tp_axis: Optional[str] = None
    dp_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        c = x.shape[-1]
        shortcut = x
        x = FastLayerNorm(epsilon=1e-6, name="norm1", dtype=self.dtype)(x)

        if self.window_size > 0 and not self.pre_windowed:
            hw = (x.shape[1], x.shape[2])
            x, padded_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        elif self.window_size > 0:
            if pad_mask is not None:
                x = x * pad_mask.astype(x.dtype)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size

        x = Attention(
            num_heads=self.num_heads,
            input_size=attn_size,
            padded_head_dim=self.padded_head_dim,
            fused_window=self.fused_window,
            cropped=self.cropped and self.window_size == 0,
            tp_axis=self.tp_axis,
            dp_axis=self.dp_axis,
            name="attn",
            dtype=self.dtype,
        )(x)

        if self.window_size > 0 and not self.pre_windowed:
            x = window_unpartition(x, self.window_size, padded_hw, hw)

        x = shortcut + x
        y = FastLayerNorm(epsilon=1e-6, name="norm2", dtype=self.dtype)(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="mlp_lin1", dtype=self.dtype)(y)
        y = fast_gelu(y, self.dtype)
        y = nn.Dense(c, name="mlp_lin2", dtype=self.dtype)(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """SAM image encoder: 1024x1024x3 -> 64x64x256 embedding."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    use_abs_pos: bool = True
    # Tensor parallelism: mesh axis to shard attention heads and the MLP
    # hidden dim over (see parallel/tensor_parallel.py for the param specs
    # and the collective layout). Cuts single-image encode latency ~1/m on
    # an m-way model axis — the axis data parallelism can't touch (the
    # interactive path encodes ONE frame on the critical path). Attention
    # runs the Pallas fused kernels per head shard via shard_map when the
    # local head count tiles (see Attention.tp_axis); the MLP stays
    # GSPMD-Megatron-sharded. `dp_axis`: the mesh axis the image batch is
    # sharded over, when TP is combined with data parallelism on a 2D mesh.
    tp_axis: Optional[str] = None
    dp_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_interm: bool = False,
                 valid_hw: Optional[Tuple[int, int]] = None):
        """x: [B, H, W, 3] normalized float; returns [B, H/16, W/16, out_chans]
        (plus, if return_interm, the first global-attention block's output —
        the `interm_embeddings[0]` consumed by the HQ-SAM decoder).

        `valid_hw`: PAD-TOKEN CROPPING (opt-in; deviates from the reference).
        SAM pads inputs square, so a 480p frame leaves ~44% of the 64x64
        token grid covering zero padding; with valid_hw = the (rows, cols)
        of real tokens, all transformer compute runs on the cropped grid
        (windowed blocks over real windows only, global attention over real
        tokens with center-sliced rel-pos tables) and the embedding's pad
        region is zero-filled. Real-token outputs differ from the reference
        ONLY through the missing pad-token keys/values in the 4 global
        layers (and the decoder seeing zeros off-image) — unvalidated
        against trained weights, hence opt-in (Sam.crop_pad_tokens).
        """
        grid = self.img_size // self.patch_size
        x = PatchEmbed(
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            name="patch_embed",
            dtype=self.dtype,
        )(x)

        if self.use_abs_pos:
            pos_embed = self.param(
                "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim)
            )
            x = x + pos_embed.astype(x.dtype)

        cropped = False
        if valid_hw is not None and tuple(valid_hw) != (grid, grid):
            vr, vc = valid_hw
            x = x[:, :vr, :vc, :]
            cropped = True

        # Group consecutive windowed blocks into spans: the residual stream
        # stays window-partitioned across each span (one partition transpose
        # per span, not per block — the per-block transposes were ~25% of
        # encoder device time). Padding slots are re-zeroed at each block's
        # attention input, matching the original per-block zero padding.
        interm = None
        # GLOBAL blocks carry the head dim padded to the 128-lane boundary
        # inside their converted weights (see Attention.padded_head_dim);
        # WINDOW blocks keep the NATIVE head dim — their kernel reads head
        # groups sized to a 128-lane multiple and slices per head in VMEM,
        # so the 80->128 pad (60% extra qkv compute + HBM traffic at ViT-H)
        # is only paid on the 4 global layers. Real SAM scale (grid >= 32)
        # only; tiny test configs use the naive paths (and the converter
        # mirrors this split via the checkpoint's pos_embed grid).
        head_dim = self.embed_dim // self.num_heads
        pad_hd = (
            ((head_dim + 127) // 128) * 128 if grid >= 32 else None
        )
        i = 0
        while i < self.depth:
            if i in self.global_attn_indexes:
                x = Block(
                    num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio,
                    window_size=0,
                    input_size=(grid, grid),
                    padded_head_dim=pad_hd,
                    cropped=cropped,
                    tp_axis=self.tp_axis,
                    dp_axis=self.dp_axis,
                    name=f"blocks_{i}",
                    dtype=self.dtype,
                )(x)
                if interm is None:
                    interm = x
                i += 1
                continue
            span_end = i
            while (
                span_end < self.depth
                and span_end not in self.global_attn_indexes
            ):
                span_end += 1
            hw = (x.shape[1], x.shape[2])
            x, padded_hw = window_partition(x, self.window_size, flat=True)
            pad_mask = _window_pad_mask(
                x.shape[0] // ((padded_hw[0] // self.window_size)
                              * (padded_hw[1] // self.window_size)),
                hw, padded_hw, self.window_size, flat=True,
            )
            for j in range(i, span_end):
                x = Block(
                    num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio,
                    window_size=self.window_size,
                    input_size=(grid, grid),
                    pre_windowed=True,
                    padded_head_dim=None,
                    fused_window=pad_hd is not None,
                    tp_axis=self.tp_axis,
                    dp_axis=self.dp_axis,
                    name=f"blocks_{j}",
                    dtype=self.dtype,
                )(x, pad_mask)
            x = window_unpartition(x, self.window_size, padded_hw, hw)
            i = span_end

        # Neck: 1x1 conv -> LN2d -> 3x3 conv -> LN2d, all in NHWC.
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1",
                    dtype=self.dtype)(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2", dtype=self.dtype)(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        if cropped:
            # zero-fill the cropped-out pad region back to the full grid
            # (the decoder consumes a [grid, grid] embedding)
            pad_r = grid - x.shape[1]
            pad_c = grid - x.shape[2]
            x = jnp.pad(x, ((0, 0), (0, pad_r), (0, pad_c), (0, 0)))
            if interm is not None:
                interm = jnp.pad(
                    interm, ((0, 0), (0, pad_r), (0, pad_c), (0, 0))
                )
        if return_interm:
            return x, interm
        return x


def build_image_encoder(variant: str, dtype: Any = jnp.float32, **kw) -> ImageEncoderViT:
    cfg = dict(VIT_VARIANTS[variant])
    cfg.update(kw)
    return ImageEncoderViT(dtype=dtype, **cfg)
