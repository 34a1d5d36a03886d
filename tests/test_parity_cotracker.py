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


class TorchCoTrackerV1(nn.Module):
    """Transcription of the published v1 CoTracker.forward over a video:
    sliding windows advancing by S/2 while start < T - S/2 (the tail window
    may overrun the video; its reads repeat the last frame and the
    track-mask rows beyond T are zero-padded), tracks sorted by query frame
    and processed as the active prefix per window (later tracks are absent
    from the transformer entirely), per-track features sampled once when a
    track joins, coords/vis carried into the next window's first half (last
    frame repeated into the second half), evolving track-mask zeroing of
    rows [0, start+S) after each window, raw-logit accumulation, final
    sigmoid. Pre-query frames inside a track's first window keep the
    model's backward-in-window predictions; earlier frames stay 0."""

    def __init__(self, window: TorchCoTrackerWindow, fnet, stride=4, s=8):
        super().__init__()
        self.window = window
        self.fnet = fnet
        self.stride = stride
        self.s = s

    @torch.no_grad()
    def forward(self, rgbs, queries, iters):
        # rgbs [T, 3, H, W] float 0-255 (T >= S); queries [N, 3] (t, x, y)
        samp = load_ref("sam_pt.point_tracker.utils.samp")
        t = rgbs.shape[0]
        s = self.s
        n = queries.shape[0]
        first = queries[:, 0].long()
        sort_inds = torch.argsort(first, stable=True)
        inv_sort = torch.argsort(sort_inds)
        first_s = first[sort_inds]
        q_xy = (queries[:, 1:] / float(self.stride))[sort_inds]  # grid units

        fmaps = self.fnet(2 * (rgbs / 255.0) - 1.0)  # [T, C, H8, W8]
        latent = fmaps.shape[1]

        traj_e = torch.zeros(t, n, 2)
        vis_e = torch.zeros(t, n)
        track_mask = (torch.arange(t)[:, None] >= first_s[None]).float()
        coords_init = q_xy[None].repeat(s, 1, 1).clone()  # [S, N, 2]
        vis_init = torch.full((s, n), 10.0)
        feats = torch.zeros(n, latent)
        prev_wind = 0
        prev_coords = prev_vis = None
        ind = 0
        while ind < t - s // 2:
            wind = int((first_s < ind + s).sum())
            if wind == 0:
                ind += s // 2
                continue
            frames = torch.clamp(torch.arange(ind, ind + s), max=t - 1)
            s_local = min(s, t - ind)
            for j in range(prev_wind, wind):  # newly joined tracks
                feats[j] = samp.bilinear_sample2d(
                    fmaps[first_s[j]][None],
                    q_xy[j, 0].reshape(1, 1), q_xy[j, 1].reshape(1, 1),
                )[0, :, 0]
            if prev_wind > 0:
                nc = prev_coords[s // 2:, :prev_wind]
                coords_init[: s // 2, :prev_wind] = nc
                coords_init[s // 2:, :prev_wind] = nc[-1]
                nv = prev_vis[s // 2:, :prev_wind]
                vis_init[: s // 2, :prev_wind] = nv
                vis_init[s // 2:, :prev_wind] = nv[-1]
            tm = track_mask[ind: ind + s, :wind]
            if tm.shape[0] < s:  # overrun: v1 zero-pads the mask rows
                tm = torch.cat([tm, torch.zeros(s - tm.shape[0], wind)], 0)
            coords, vis, _ = self.window(
                fmaps[frames], coords_init[:, :wind].clone(),
                feats[:wind].clone(), tm, iters=iters,
                vis_init=vis_init[:, :wind].clone(),
            )
            traj_e[ind: ind + s_local, :wind] = coords[:s_local]
            vis_e[ind: ind + s_local, :wind] = vis[:s_local]
            track_mask[: ind + s, :wind] = 0.0
            prev_coords = torch.zeros(s, n, 2)
            prev_coords[:, :wind] = coords
            prev_vis = torch.zeros(s, n)
            prev_vis[:, :wind] = vis
            prev_wind = wind
            ind += s // 2
        traj_e = traj_e[:, inv_sort] * float(self.stride)
        vis_e = torch.sigmoid(vis_e[:, inv_sort])
        return traj_e, vis_e


def torch_reference_wrapper_forward(model, rgbs_uint8, qp, interp_shape,
                                    support_grid_size, every_n,
                                    vis_threshold, iters):
    """Transcription of the reference CoTracker wrapper
    (sam_pt/point_tracker/cotracker/tracker.py:75-147, 149-170): resize to
    interp_shape, scale queries, append support grids every N frames,
    forward + backward pass on the flipped video, fill exact zeros from the
    backward pass, drop support points, threshold, rescale. Uses the repo's
    get_points_on_a_grid for both sides (its v1 semantics are pinned by
    tests/test_cotracker.py)."""
    import torch.nn.functional as F

    from sam_pt_tpu.models.tracker.cotracker.tracker import (
        get_points_on_a_grid,
    )

    t, h, w, _ = rgbs_uint8.shape
    rgbs = torch.from_numpy(rgbs_uint8.astype(np.float32)).permute(0, 3, 1, 2)
    ih, iw = interp_shape
    if (ih, iw) != (h, w):
        rgbs = F.interpolate(rgbs, (ih, iw), mode="bilinear")
    queries = torch.from_numpy(np.asarray(qp, np.float32)).clone()
    queries[:, 1] *= iw / w
    queries[:, 2] *= ih / h
    if support_grid_size > 0:
        extra = []
        for i in range(0, t, every_n):
            grid = torch.from_numpy(
                get_points_on_a_grid(support_grid_size, (ih, iw))[0])
            extra.append(
                torch.cat([torch.full((len(grid), 1), float(i)), grid], 1))
        queries = torch.cat([queries] + extra, 0)

    traj, vis = model(rgbs, queries, iters)
    inv_q = queries.clone()
    inv_q[:, 0] = t - inv_q[:, 0] - 1
    traj_b, vis_b = model(rgbs.flip(0), inv_q, iters)
    traj_b = traj_b.flip(0)
    vis_b = vis_b.flip(0)
    mask = traj == 0
    traj[mask] = traj_b[mask]
    vis[mask[..., 0]] = vis_b[mask[..., 0]]

    n = qp.shape[0]
    traj = traj[:, :n]
    vis = vis[:, :n] > vis_threshold
    traj[..., 0] *= w / float(iw)
    traj[..., 1] *= h / float(ih)
    return traj, vis


def _tiny_full_stack(iters=1, latent=8):
    """Torch v1 full model + converted params + our tracker, tiny dims.

    A fresh tracker per `iters` config: `_track_jit` is jitted with `self`
    static, so a mutated `tracker.iters` would silently reuse the cached
    program."""
    from sam_pt_tpu.models.tracker.cotracker.model import CoTracker
    from sam_pt_tpu.models.tracker.cotracker.tracker import (
        CoTrackerPointTracker,
    )

    input_dim = 130 + 196 + latent + 2
    torch.manual_seed(11)
    tw = TorchCoTrackerWindow(latent=latent, input_dim=input_dim).eval()
    with torch.no_grad():
        # Random (non-contractive) weights amplify float noise ~30x per
        # chained window through the coords -> correlation-sample feedback
        # (measured; trained weights are contractive). Scale the delta head
        # down so the cross-window WIRING stays testable at tight tolerance.
        tw.updateformer.flow_head.weight *= 0.05
        tw.updateformer.flow_head.bias *= 0.05
    pips = load_ref("sam_pt.point_tracker.pips.pips")
    torch.manual_seed(12)
    fnet = pips.BasicEncoder(output_dim=latent, norm_fn="instance",
                             stride=4).eval()
    tmodel = TorchCoTrackerV1(tw, fnet, stride=4, s=8)

    sd = {k: v for k, v in tw.state_dict().items()}
    sd.update({f"fnet.{k}": v for k, v in fnet.state_dict().items()})
    params = convert_cotracker_state_dict(sd)

    tracker = CoTrackerPointTracker(
        interp_shape=None, support_grid_size=0, s=8, stride=4, iters=iters,
        allow_random_init=True,
    )
    tracker.model = CoTracker(
        s=8, stride=4, latent_dim=latent, input_dim=input_dim,
        hidden_size=64, num_heads=4, space_depth=2, time_depth=4,
    )
    tracker.params = params
    return tmodel, tracker


class TestCoTrackerParity:
    def test_full_forward_sliding_windows_matches_torch(self, rng):
        """Whole-video v1 forward (windows + active-prefix exclusion +
        carry + evolving track mask + overrunning tail window) vs the torch
        transcription, through the converter. T=13 forces an overrun tail
        window (starts 0/4/8, 3 repeat-pad frames); staggered query frames
        force tracks to join at windows 0, 1 and 2."""
        # 64x64 keeps the coarsest 4-level pyramid at 2x2 (the reference's
        # RAFT-style bilinear_sampler divides by W-1, so 1x1 levels NaN)
        t, h, w = 13, 64, 64
        rgbs = rng.integers(0, 255, (t, h, w, 3)).astype(np.uint8)
        qp = np.array(
            [[0, 18.0, 12.0], [0, 44.0, 52.0], [5, 34.0, 19.0], [9, 12.0, 38.0]],
            np.float32,
        )
        rgbs_torch = torch.from_numpy(
            rgbs.astype(np.float32)).permute(0, 3, 1, 2)

        for iters, atol in ((1, 2e-4), (2, 3e-2)):
            tmodel, tracker = _tiny_full_stack(iters=iters)
            fmaps = tracker._encode_video(rgbs.astype(np.float32))
            ref_traj, ref_vis = tmodel(
                rgbs_torch, torch.from_numpy(qp), iters=iters)
            traj, vis = tracker._track_jit(
                tracker.params, fmaps, jnp.asarray(qp), t)
            np.testing.assert_allclose(
                np.asarray(traj), ref_traj.numpy(), rtol=0, atol=atol)
            np.testing.assert_allclose(
                np.asarray(vis), ref_vis.numpy(), rtol=0, atol=atol)

    def test_wrapper_backward_merge_matches_torch(self, rng):
        """Full reference-wrapper path: support grids every 6 frames,
        forward + backward passes, zero-fill merge, support-point drop,
        visibility threshold, coordinate rescale."""
        tmodel, tracker = _tiny_full_stack(iters=1)
        tracker.interp_shape = None
        tracker.support_grid_size = 2
        tracker.support_grid_every_n_frames = 6
        tracker.visibility_threshold = 0.7

        t, h, w = 13, 64, 64
        rgbs = rng.integers(0, 255, (t, h, w, 3)).astype(np.uint8)
        qp = np.array(
            [[0, 18.0, 12.0], [4, 44.0, 52.0], [6, 34.0, 19.0]], np.float32)

        ref_traj, ref_vis = torch_reference_wrapper_forward(
            tmodel, rgbs, qp, (h, w), support_grid_size=2, every_n=6,
            vis_threshold=0.7, iters=1)
        traj, vis = tracker.forward(rgbs[None], qp[None])

        np.testing.assert_allclose(
            traj[0], ref_traj.numpy(), rtol=0, atol=2e-4)
        np.testing.assert_array_equal(
            vis[0].astype(bool), ref_vis.numpy())
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
