"""Checkpoint-conversion numerical parity: RAFT vs the reference torch model.

Random-init the reference RAFT (reference raft_core/raft.py:25-144), convert
with utils/checkpoint.py, compare upsampled flow. Random update weights are
not contractive, so the flow head is damped for the many-iteration check
(all layers still exercised).
"""
import jax
import numpy as np
import pytest
import torch

from sam_pt_tpu.models.tracker.raft.model import Raft
from sam_pt_tpu.utils.checkpoint import (
    convert_raft_state_dict,
    validate_against_template,
)

from reference_loader import load_ref


@pytest.fixture(scope="module")
def ref_raft():
    mod = load_ref("sam_pt.point_tracker.raft.raft_core.raft")
    torch.manual_seed(0)
    class Args(dict):
        # the reference accesses args both as attributes and with `in`
        # (raft.py:44-48)
        __getattr__ = dict.__getitem__

    args = Args(small=False, mixed_precision=False, dropout=0,
                alternate_corr=False)
    model = mod.RAFT(args)
    with torch.no_grad():
        model.update_block.flow_head.conv2.weight *= 0.05
        model.update_block.flow_head.conv2.bias *= 0.05
    model.eval()
    return model


class TestConvexUpsampleParity:
    def test_matches_reference_on_random_inputs(self, ref_raft, rng):
        """Direct check with UNdamped random mask/flow: the full-model test
        is insensitive to the convex-weight channel layout when the coarse
        flow is nearly constant, so exercise the upsampler alone (reference
        raft_core/raft.py:75-86 mask.view(N, 1, 9, 8, 8, H, W))."""
        from sam_pt_tpu.models.tracker.raft.model import convex_upsample

        b, h, w = 2, 6, 8
        flow = rng.standard_normal((b, 2, h, w)).astype(np.float32) * 3
        mask = rng.standard_normal((b, 64 * 9, h, w)).astype(np.float32)

        with torch.no_grad():
            ref = ref_raft.upsample_flow(
                torch.from_numpy(flow), torch.from_numpy(mask)
            ).numpy().transpose(0, 2, 3, 1)  # [B, 8h, 8w, 2]

        got = convex_upsample(
            np.transpose(flow, (0, 2, 3, 1)),
            np.transpose(mask, (0, 2, 3, 1)),
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=0, atol=1e-4)


class TestRaftParity:
    @pytest.mark.parametrize("iters,atol", [(2, 3e-3), (8, 1e-2)])
    def test_flow_matches_reference(self, ref_raft, rng, iters, atol):
        # h/8, w/8 must keep every corr pyramid level >= 2x2: the reference
        # bilinear_sampler divides by (W_l - 1) and NaNs on 1x1 levels.
        h, w = 128, 160
        img1 = rng.integers(0, 256, size=(1, 3, h, w)).astype(np.float32)
        img2 = rng.integers(0, 256, size=(1, 3, h, w)).astype(np.float32)

        with torch.no_grad():
            _, flow_up, _ = ref_raft(
                torch.from_numpy(img1), torch.from_numpy(img2),
                iters=iters, test_mode=True,
            )
        ref_flow = flow_up[0].numpy().transpose(1, 2, 0)  # [H, W, 2]

        params = convert_raft_state_dict(ref_raft.state_dict())
        model = Raft()
        j1 = 2 * (np.transpose(img1, (0, 2, 3, 1)) / 255.0) - 1.0
        j2 = 2 * (np.transpose(img2, (0, 2, 3, 1)) / 255.0) - 1.0
        template = model.init(
            jax.random.PRNGKey(0), j1.astype(np.float32),
            j2.astype(np.float32), iters=1,
        )
        validate_against_template(params, template)

        flow = model.apply(params, j1.astype(np.float32),
                           j2.astype(np.float32), iters=iters)

        np.testing.assert_allclose(
            np.asarray(flow[0]), ref_flow, rtol=0, atol=atol
        )
