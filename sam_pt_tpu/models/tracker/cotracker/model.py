"""CoTracker sliding-window transformer point tracker, TPU-native.

Re-implements the architecture of the external `cotracker` package consumed
by the reference (SURVEY.md §2.9: CNN feature net, windowed spatio-temporal
transformer updater, 4-level correlation sampling, visibility head; wrapper
behavior in sam_pt/point_tracker/cotracker/tracker.py).

Architecture (CoTracker v1, stride-4 window-8 configuration):
  - BasicEncoder CNN (instance norm, stride 4), latent 128 — shared with the
    PIPS family and reused from tracker/pips/model.py.
  - Per refinement iteration: 4-level correlation pyramid sampled at radius 3
    (matmul-based, no gathers), flow sincos embedding, track features.
  - UpdateFormer: tokens are (track, window-frame) pairs; `time_depth`
    attention blocks over the time axis interleaved with `space_depth`
    blocks over the track axis (virtual-track attention), hidden 384,
    heads 8, mlp x4, affine-free pre-LNs; outputs (dcoord, dfeat).
  - Visibility head on final track features, trained with sigmoid.

Input tokens are [flow_emb(130), corr(196), feats(128)] zero-padded to
`input_dim` (456) plus a 2D sincos positional embedding of the query
location sampled from the feature-grid PE table.

TPU-first notes: tokens live as [N, S, C] dense arrays (window S is static);
time/space attention are plain batched MHAs — XLA maps them onto the MXU.
Temporal chaining across windows happens in the tracker via carried state.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..pips.model import (
    BasicEncoder,
    correlation_pyramid,
    sample_corr_pyramid,
)
from ....ops.posemb import (
    get_1d_sincos_embedding,
    get_2d_sincos_embedding,
    sincos_pos_embed_2d_grid,
)
from ....ops.sampling import bilinear_sample


class MHA(nn.Module):
    """timm-style multi-head attention (qkv fused, bias on qkv and proj).

    `key_mask` [L] bool: False keys get -1e30 logits before the softmax —
    an exact-zero contribution in float32, numerically identical to
    excluding the tokens from the sequence (CoTracker v1 runs only the
    already-activated track prefix through the transformer; see the
    wrapper). -1e30 instead of -inf so an all-masked window degrades to
    finite garbage (discarded by the caller) rather than NaN."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask=None):  # [B, L, C], [L] bool
        b, l, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, name="qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(b, l, 3, self.num_heads, hd)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ jnp.swapaxes(k, -1, -2)) / (hd ** 0.5)
        attn = attn.astype(jnp.float32)
        if key_mask is not None:
            attn = jnp.where(key_mask[None, None, None, :], attn, -1e30)
        attn = jax.nn.softmax(attn, -1).astype(self.dtype)
        out = attn @ v
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, l, c)
        return nn.Dense(c, name="proj", dtype=self.dtype)(out)


class AttnBlock(nn.Module):
    """Pre-LN (affine-free) attention + MLP block."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask=None):
        c = x.shape[-1]
        y = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        x = x + MHA(self.num_heads, name="attn", dtype=self.dtype)(y, key_mask)
        y = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1",
                     dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=True)
        y = nn.Dense(c, name="mlp_fc2", dtype=self.dtype)(y)
        return x + y


class UpdateFormer(nn.Module):
    """Interleaved time/track attention over [N, S, C] window tokens."""

    space_depth: int = 6
    time_depth: int = 6
    input_dim: int = 456
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 130
    mlp_ratio: float = 4.0
    add_space_attn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, active=None):
        # tokens [N, S, input_dim] (single video); active [N] bool — tracks
        # not yet activated are masked out of the cross-track (space)
        # attention, matching v1's per-window prefix slicing (time attention
        # is per-track, so no masking is needed there)
        x = nn.Dense(self.hidden_size, name="input_transform",
                     dtype=self.dtype)(tokens)
        j = 0
        stride = max(1, self.time_depth // max(self.space_depth, 1))
        for i in range(self.time_depth):
            x = AttnBlock(self.num_heads, self.mlp_ratio,
                          name=f"time_blocks_{i}", dtype=self.dtype)(x)
            if self.add_space_attn and (i % stride == 0) and j < self.space_depth:
                xs = jnp.swapaxes(x, 0, 1)  # [S, N, C] — attend across tracks
                xs = AttnBlock(self.num_heads, self.mlp_ratio,
                               name=f"space_blocks_{j}", dtype=self.dtype)(
                    xs, key_mask=active)
                x = jnp.swapaxes(xs, 0, 1)
                j += 1
        return nn.Dense(self.output_dim, name="flow_head", dtype=self.dtype)(x)


class CoTracker(nn.Module):
    """Window model over precomputed feature maps (chaining in the tracker)."""

    s: int = 8
    stride: int = 4
    latent_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 3
    input_dim: int = 456
    hidden_size: int = 384
    num_heads: int = 8
    space_depth: int = 6
    time_depth: int = 6
    dtype: Any = jnp.float32

    def setup(self):
        self.fnet = BasicEncoder(
            output_dim=self.latent_dim, stride=self.stride, dtype=self.dtype
        )
        self.updateformer = UpdateFormer(
            space_depth=self.space_depth,
            time_depth=self.time_depth,
            input_dim=self.input_dim,
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            output_dim=self.latent_dim + 2,
            dtype=self.dtype,
        )
        self.ffeat_norm = nn.LayerNorm(epsilon=1e-5, name="ffeat_norm",
                                       dtype=self.dtype)
        self.ffeat_updater = nn.Dense(self.latent_dim, name="ffeat_updater",
                                      dtype=self.dtype)
        self.vis_predictor = nn.Dense(1, name="vis_predictor",
                                      dtype=self.dtype)

    def encode_frames(self, rgbs: jnp.ndarray) -> jnp.ndarray:
        """[T, H, W, 3] float 0-255 -> fmaps [T, H/stride, W/stride, C]."""
        x = 2.0 * (rgbs.astype(jnp.float32) / 255.0) - 1.0
        return self.fnet(x.astype(self.dtype))

    def __call__(
        self,
        fmaps: jnp.ndarray,       # [S, H8, W8, C]
        coords_init: jnp.ndarray,  # [S, N, 2] in feature-grid coords
        feats_init: jnp.ndarray,   # [N, C]
        track_mask: jnp.ndarray,   # [S, N] float (1 after query frame)
        iters: int = 4,
        vis_init: Optional[jnp.ndarray] = None,  # [S, N] flag-channel value
        active: Optional[jnp.ndarray] = None,    # [N] bool: in this window
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One window refinement. Returns (coords [S, N, 2] grid coords,
        vis_logits [S, N], feats [S, N, C]).

        vis_init is the second flag channel fed to the transformer: 10.0 for
        a track's first window (v1's `vis_init = ones * 10`), the PREVIOUS
        window's predicted visibility logits for carried tracks (v1's
        forward copies `vis[:, S//2:]` into the next window's vis_init).
        None = all 10.0 (single-window use / tests).

        active marks tracks whose query frame falls before the window's end;
        v1 runs ONLY that (sorted) prefix of tracks through the transformer
        per window, so inactive tracks must not be visible to cross-track
        attention — they are masked out of the space blocks (their own
        outputs are garbage and must be discarded by the caller). None =
        all tracks active."""
        s, h8, w8, c = fmaps.shape
        n = coords_init.shape[1]

        pe_table = sincos_pos_embed_2d_grid(self.input_dim, (h8, w8))
        # positional embedding sampled at each track's first-frame location
        pos = bilinear_sample(
            pe_table, coords_init[0, :, 0], coords_init[0, :, 1]
        )  # [N, input_dim]
        # 1D sincos embedding of the window frame index (CoTracker v1's
        # times_embed: x = transformer_input + pos_embed + times_embed)
        times = get_1d_sincos_embedding(
            jnp.arange(s, dtype=jnp.float32), self.input_dim
        )  # [S, input_dim]

        coords = coords_init
        ffeats = jnp.broadcast_to(feats_init[None], (s, n, c))

        for _ in range(iters):
            pyramid = correlation_pyramid(fmaps, ffeats, self.corr_levels)
            fcorrs = sample_corr_pyramid(pyramid, coords, self.corr_radius)

            # flows stay in FEATURE-GRID units (v1's whole transformer
            # operates at /stride scale; deltas apply to grid coords
            # directly — no stride scaling on either side)
            flows = coords - coords[0:1]
            flows_emb = get_2d_sincos_embedding(flows, 64, cat_coords=True)

            tokens = jnp.concatenate(
                [flows_emb, fcorrs, ffeats], axis=-1
            )  # [S, N, 454] at the published config
            # pad only for sub-456 test configs; the LAST TWO channels are
            # always [track_mask, vis_init=10] as in v1 (the checkpoint's
            # input_transform rows are trained on those flag values —
            # zeroing whole inactive tokens would feed it an input
            # distribution it never saw)
            pad = self.input_dim - tokens.shape[-1] - 2
            if pad > 0:
                tokens = jnp.concatenate(
                    [tokens, jnp.zeros((s, n, pad), tokens.dtype)], axis=-1
                )
            vis_chan = (
                jnp.full((s, n, 1), 10.0, tokens.dtype)
                if vis_init is None
                else vis_init[..., None].astype(tokens.dtype)
            )
            tokens = jnp.concatenate(
                [
                    tokens,
                    track_mask[..., None].astype(tokens.dtype),
                    vis_chan,
                ],
                axis=-1,
            )
            tokens = tokens + pos[None] + times[:, None]

            delta = self.updateformer(
                jnp.swapaxes(tokens, 0, 1).astype(self.dtype), active
            )  # [N, S, C+2]
            delta = jnp.swapaxes(delta, 0, 1)  # [S, N, C+2]
            dcoords = delta[..., :2]
            dfeats = delta[..., 2:]

            upd = nn.gelu(
                self.ffeat_updater(self.ffeat_norm(dfeats)), approximate=False
            )
            ffeats = ffeats + upd
            coords = coords + dcoords

        vis_logits = self.vis_predictor(ffeats)[..., 0]
        return coords, vis_logits, ffeats
