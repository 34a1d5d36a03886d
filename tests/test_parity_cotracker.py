"""Checkpoint-conversion parity: CoTracker vs a torch micro-reference.

The reference consumes CoTracker from an external pip package
(cotracker_stride_4_wind_8.pth; reference cotracker/tracker.py) that is not
installed here and cannot be downloaded (no egress). This test transcribes
the PUBLISHED CoTracker v1 modules in torch with the exact checkpoint
namespace (fnet.*, updateformer.{input_transform,flow_head,time_blocks.i,
space_blocks.j}.*, norm.*, ffeat_updater.*, vis_predictor.*) and checks that
convert_cotracker_state_dict + our flax modules reproduce its outputs.

The fnet is the same BasicEncoder as PIPS (stride 4), whose converter layout
is already validated against the reference's own torch code in
tests/test_parity_pips.py; here the transformer core is exercised.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from sam_pt_tpu.models.tracker.cotracker.model import (
    AttnBlock as JAttnBlock,
    UpdateFormer as JUpdateFormer,
)
from sam_pt_tpu.utils.checkpoint import convert_cotracker_state_dict

from reference_loader import load_ref


def _fnet_state_dict():
    """CoTracker's fnet is the same BasicEncoder as PIPS (stride 4); use the
    reference's own torch module to populate that part of the namespace."""
    mod = load_ref("sam_pt.point_tracker.pips.pips")
    torch.manual_seed(7)
    enc = mod.BasicEncoder(output_dim=128, norm_fn="instance", stride=4)
    return {f"fnet.{k}": v for k, v in enc.state_dict().items()}


# --- torch transcription of the published CoTracker v1 transformer ---------

class TorchAttention(nn.Module):
    """timm-style attention (qkv fused with bias, proj with bias)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x):
        b, l, c = x.shape
        hd = c // self.num_heads
        qkv = self.qkv(x).reshape(b, l, 3, self.num_heads, hd)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, l, c)
        return self.proj(out)


class TorchAttnBlock(nn.Module):
    def __init__(self, hidden_size, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden_size, elementwise_affine=False,
                                  eps=1e-6)
        self.attn = TorchAttention(hidden_size, num_heads)
        self.norm2 = nn.LayerNorm(hidden_size, elementwise_affine=False,
                                  eps=1e-6)
        hidden = int(hidden_size * mlp_ratio)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(hidden_size, hidden)
        self.mlp.act = nn.GELU(approximate="tanh")
        self.mlp.fc2 = nn.Linear(hidden, hidden_size)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        y = self.norm2(x)
        return x + self.mlp.fc2(self.mlp.act(self.mlp.fc1(y)))


class TorchUpdateFormer(nn.Module):
    """Published CoTracker v1 UpdateFormer: interleaved time/space attention
    over [B, N, T, C] tokens."""

    def __init__(self, space_depth=2, time_depth=4, input_dim=456,
                 hidden_size=64, num_heads=4, output_dim=130):
        super().__init__()
        self.input_transform = nn.Linear(input_dim, hidden_size, bias=True)
        self.flow_head = nn.Linear(hidden_size, output_dim, bias=True)
        self.time_blocks = nn.ModuleList(
            [TorchAttnBlock(hidden_size, num_heads) for _ in range(time_depth)]
        )
        self.space_blocks = nn.ModuleList(
            [TorchAttnBlock(hidden_size, num_heads) for _ in range(space_depth)]
        )

    def forward(self, x):  # [B, N, T, C]
        x = self.input_transform(x)
        j = 0
        stride = len(self.time_blocks) // len(self.space_blocks)
        for i in range(len(self.time_blocks)):
            b, n, t, c = x.shape
            xt = x.reshape(b * n, t, c)
            xt = self.time_blocks[i](xt)
            x = xt.reshape(b, n, t, c)
            if i % stride == 0 and j < len(self.space_blocks):
                xs = x.permute(0, 2, 1, 3).reshape(b * t, n, c)
                xs = self.space_blocks[j](xs)
                x = xs.reshape(b, t, n, c).permute(0, 2, 1, 3)
                j += 1
        return self.flow_head(x)


# --- full v1 forward_iteration transcription -------------------------------
# MAE-style sincos tables exactly as the published get_*_sincos_pos_embed
# numpy helpers build them (CoTracker v1 vendors them verbatim).

def _mae_1d(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def _mae_2d_grid(embed_dim, grid_hw):
    h, w = grid_hw
    grid = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))  # grid[0] = x mesh
    emb_x = _mae_1d(embed_dim // 2, grid[0])  # [h*w, d/2]
    emb_y = _mae_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_x, emb_y], axis=1).reshape(h, w, embed_dim)


def _torch_get_2d_embedding(xy, c):
    """v1's get_2d_embedding(xy, C, cat_coords=True): interleaved sin/cos per
    coordinate, raw xy PREPENDED."""
    b, n, _ = xy.shape
    x, y = xy[..., 0:1], xy[..., 1:2]
    div = (torch.arange(0, c, 2).float() * (1000.0 / c)).reshape(1, 1, c // 2)
    pe_x = torch.zeros(b, n, c)
    pe_y = torch.zeros(b, n, c)
    pe_x[..., 0::2] = torch.sin(x * div)
    pe_x[..., 1::2] = torch.cos(x * div)
    pe_y[..., 0::2] = torch.sin(y * div)
    pe_y[..., 1::2] = torch.cos(y * div)
    return torch.cat([xy, pe_x, pe_y], dim=2)


class TorchCoTrackerWindow(nn.Module):
    """The published CoTracker v1 forward_iteration for ONE window, on
    precomputed feature maps: correlation pyramid (the same CorrBlock as the
    reference's in-repo PIPS), flow/pos/times embeddings, flag channels,
    UpdateFormer, GroupNorm+Linear+GELU feature updater, visibility head."""

    def __init__(self, latent=8, input_dim=336, hidden=64, heads=4,
                 time_depth=4, space_depth=2):
        super().__init__()
        self.latent = latent
        self.input_dim = input_dim
        self.updateformer = TorchUpdateFormer(
            space_depth=space_depth, time_depth=time_depth,
            input_dim=input_dim, hidden_size=hidden, num_heads=heads,
            output_dim=latent + 2)
        self.norm = nn.GroupNorm(1, latent)
        self.ffeat_updater = nn.Sequential(nn.Linear(latent, latent),
                                           nn.GELU())
        self.vis_predictor = nn.Sequential(nn.Linear(latent, 1))

    def forward(self, fmaps, coords_init, feats_init, track_mask, iters,
                vis_init=None):
        # fmaps [S, C, H8, W8]; coords_init [S, N, 2] grid units;
        # feats_init [N, C]; track_mask [S, N]; vis_init [S, N] flag-channel
        # values (v1: 10.0 on a track's first window, carried vis logits on
        # later windows)
        pips = load_ref("sam_pt.point_tracker.pips.pips")
        samp = load_ref("sam_pt.point_tracker.utils.samp")
        s, c, h8, w8 = fmaps.shape
        n = coords_init.shape[1]
        fcorr = pips.CorrBlock(fmaps[None], num_levels=4, radius=3)

        table = torch.from_numpy(
            _mae_2d_grid(self.input_dim, (h8, w8))).float()
        pos = samp.bilinear_sample2d(
            table.permute(2, 0, 1)[None],
            coords_init[0, :, 0][None], coords_init[0, :, 1][None],
        )[0].permute(1, 0)  # [N, input_dim]
        times = torch.from_numpy(
            _mae_1d(self.input_dim, np.arange(s, dtype=np.float32))).float()

        coords = coords_init.clone()
        ffeats = feats_init[None].repeat(s, 1, 1)
        if vis_init is None:
            vis_init = torch.full((s, n), 10.0)
        for _ in range(iters):
            fcorr.corr(ffeats[None])
            fcorrs = fcorr.sample(coords[None])[0]  # [S, N, LRR]
            flows = coords - coords[0:1]
            flows_cat = _torch_get_2d_embedding(
                flows.permute(1, 0, 2), 64)  # [N, S, 130]
            tokens = torch.cat(
                [
                    flows_cat,
                    fcorrs.permute(1, 0, 2),
                    ffeats.permute(1, 0, 2),
                    track_mask.permute(1, 0)[..., None],
                    vis_init.permute(1, 0)[..., None],
                ],
                dim=2,
            )  # [N, S, input_dim]
            x = tokens + pos[:, None, :] + times[None]
            delta = self.updateformer(x[None])[0]  # [N, S, latent+2]
            d_coord = delta[..., :2].permute(1, 0, 2)
            d_feats = delta[..., 2:].permute(1, 0, 2)
            ffeats = ffeats + self.ffeat_updater(
                self.norm(d_feats.reshape(-1, self.latent))
            ).reshape(s, n, self.latent)
            coords = coords + d_coord
        vis = self.vis_predictor(
            ffeats.reshape(-1, self.latent)).reshape(s, n)
        return coords, vis, ffeats


class TestCoTrackerParity:
    def test_full_window_forward_matches_torch(self, rng):
        """Full v1 forward_iteration (token assembly + refinement loop +
        heads) vs the torch transcription, through the converter."""
        from sam_pt_tpu.models.tracker.cotracker.model import CoTracker

        torch.manual_seed(3)
        latent = 8
        input_dim = 130 + 196 + latent + 2  # flows_emb, fcorrs, feats, flags
        tw = TorchCoTrackerWindow(latent=latent, input_dim=input_dim).eval()

        s, n, h8, w8 = 8, 5, 24, 16
        fmaps = rng.standard_normal((s, latent, h8, w8)).astype(np.float32)
        base = rng.uniform(3.0, 12.0, (1, n, 2)).astype(np.float32)
        walk = rng.normal(0, 0.7, (s, n, 2)).astype(np.float32).cumsum(0)
        coords_init = base + walk
        feats_init = rng.standard_normal((n, latent)).astype(np.float32)
        track_mask = (np.arange(s)[:, None]
                      >= np.array([0, 0, 3, 5, 0])[None]).astype(np.float32)

        sd = {k: v for k, v in tw.state_dict().items()}
        sd.update(_fnet_state_dict())
        params = convert_cotracker_state_dict(sd)

        model = CoTracker(s=s, stride=4, latent_dim=latent, input_dim=input_dim,
                          hidden_size=64, num_heads=4, space_depth=2,
                          time_depth=4)

        # The refinement loop feeds coords back through bilinear correlation
        # sampling, so with RANDOM (non-contractive) weights float noise
        # amplifies ~200x per iteration (measured: 1e-6 @ iters=1,
        # 2e-4 @ iters=2, 2.5e-2 @ iters=3 — pure torch-vs-XLA summation
        # order). iters=1 pins the exact wiring; iters=2 guards the
        # coords/ffeats carry across iterations.
        # vis_init=None pins the first-window flag value (10.0); the random
        # vis_init pins the carried-window path (v1 feeds the previous
        # window's vis logits into this channel)
        vis_carried = rng.normal(0, 4.0, (s, n)).astype(np.float32)
        for vis_init, iters, atol in (
            (None, 1, 1e-5), (None, 2, 2e-3), (vis_carried, 1, 1e-5),
        ):
            with torch.no_grad():
                rc, rv, rf = tw(
                    torch.from_numpy(fmaps), torch.from_numpy(coords_init),
                    torch.from_numpy(feats_init),
                    torch.from_numpy(track_mask), iters=iters,
                    vis_init=None if vis_init is None
                    else torch.from_numpy(vis_init),
                )
            jc, jv, jf = model.apply(
                params,
                jnp.asarray(np.transpose(fmaps, (0, 2, 3, 1))),  # [S,H8,W8,C]
                jnp.asarray(coords_init), jnp.asarray(feats_init),
                jnp.asarray(track_mask), iters=iters,
                vis_init=None if vis_init is None else jnp.asarray(vis_init),
            )
            np.testing.assert_allclose(np.asarray(jc), rc.numpy(), atol=atol,
                                       rtol=0)
            np.testing.assert_allclose(np.asarray(jv), rv.numpy(), atol=atol,
                                       rtol=0)
            np.testing.assert_allclose(np.asarray(jf), rf.numpy(), atol=atol,
                                       rtol=0)

    def test_updateformer_matches_torch(self, rng):
        torch.manual_seed(0)
        tf = TorchUpdateFormer(space_depth=2, time_depth=4, input_dim=40,
                               hidden_size=64, num_heads=4, output_dim=18)
        tf.eval()

        n, s, c = 6, 8, 40
        tokens = rng.standard_normal((1, n, s, c)).astype(np.float32)
        with torch.no_grad():
            ref = tf(torch.from_numpy(tokens))[0].numpy()  # [N, S, out]

        # wrap into the cotracker .pth namespace and convert
        sd = {f"updateformer.{k}": v for k, v in tf.state_dict().items()}
        sd.update(_fnet_state_dict())
        # converter needs the full-model namespace; add the heads it expects
        sd["norm.weight"] = torch.ones(8)
        sd["norm.bias"] = torch.zeros(8)
        sd["ffeat_updater.0.weight"] = torch.eye(8)
        sd["ffeat_updater.0.bias"] = torch.zeros(8)
        sd["vis_predictor.0.weight"] = torch.ones(1, 8)
        sd["vis_predictor.0.bias"] = torch.zeros(1)
        params = convert_cotracker_state_dict(sd)

        model = JUpdateFormer(space_depth=2, time_depth=4, input_dim=40,
                              hidden_size=64, num_heads=4, output_dim=18)
        out = model.apply(
            {"params": params["params"]["updateformer"]}, tokens[0]
        )  # [N, S, out]

        np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=2e-5)

    def test_attn_block_matches_torch(self, rng):
        torch.manual_seed(1)
        blk = TorchAttnBlock(32, 4).eval()
        x = rng.standard_normal((2, 5, 32)).astype(np.float32)
        with torch.no_grad():
            ref = blk(torch.from_numpy(x)).numpy()

        sd = {f"updateformer.time_blocks.0.{k}": v
              for k, v in blk.state_dict().items()}
        sd.update(_fnet_state_dict())
        sd.update({
            "updateformer.input_transform.weight": torch.eye(32),
            "updateformer.input_transform.bias": torch.zeros(32),
            "updateformer.flow_head.weight": torch.eye(32),
            "updateformer.flow_head.bias": torch.zeros(32),
            "norm.weight": torch.ones(8), "norm.bias": torch.zeros(8),
            "ffeat_updater.0.weight": torch.eye(8),
            "ffeat_updater.0.bias": torch.zeros(8),
            "vis_predictor.0.weight": torch.ones(1, 8),
            "vis_predictor.0.bias": torch.zeros(1),
        })
        params = convert_cotracker_state_dict(sd)

        model = JAttnBlock(num_heads=4)
        out = model.apply(
            {"params": params["params"]["updateformer"]["time_blocks_0"]}, x
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=2e-5)
