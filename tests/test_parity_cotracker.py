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


class TestCoTrackerParity:
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
