"""Checkpoint-conversion numerical parity: PIPS++ vs the reference torch model.

Random-init reference PipsPlusPlus (reference pips_plus_plus.py:341-546),
convert with utils/checkpoint.py, compare refined trajectories. Delta head
damped for the long-iteration check (random weights are not contractive).
"""
import jax
import numpy as np
import pytest
import torch

from sam_pt_tpu.models.tracker.pips2.model import PipsPlusPlus
from sam_pt_tpu.utils.checkpoint import (
    convert_pips2_state_dict,
    validate_against_template,
)

from reference_loader import load_ref


@pytest.fixture(scope="module")
def ref_pips2():
    mod = load_ref("sam_pt.point_tracker.pips_plus_plus.pips_plus_plus")
    # the reference hardcodes torch.tensor(0.0).cuda() in forward (:438);
    # make .cuda() a no-op on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)
    model = mod.PipsPlusPlus(stride=8)
    with torch.no_grad():
        model.delta_block.dense.weight *= 0.05
        model.delta_block.dense.bias *= 0.05
    model.eval()
    return model


class TestPips2Parity:
    @pytest.mark.parametrize("iters,atol", [(2, 2e-3), (8, 5e-3)])
    def test_forward_matches_reference(self, ref_pips2, rng, iters, atol):
        s, h, w, n = 8, 128, 160, 5
        rgbs = rng.integers(0, 256, size=(1, s, 3, h, w)).astype(np.float32)
        xys = np.stack(
            [rng.uniform(8, w - 9, n), rng.uniform(8, h - 9, n)], axis=-1
        ).astype(np.float32)
        trajs0 = np.broadcast_to(xys[None, None], (1, s, n, 2)).copy()

        with torch.no_grad():
            preds1, _, _, _ = ref_pips2(
                torch.from_numpy(trajs0), torch.from_numpy(rgbs), iters=iters
            )
        ref_coords = preds1[-1][0].numpy()  # [S, N, 2]

        params = convert_pips2_state_dict(ref_pips2.state_dict())
        model = PipsPlusPlus(stride=8)
        template = model.init(
            jax.random.PRNGKey(0),
            np.zeros((s, h // 8, w // 8, 128), np.float32),
            trajs0[0],
            iters=1,
        )
        validate_against_template(params, template)

        fmaps = model.apply(
            params, np.transpose(rgbs[0], (0, 2, 3, 1)),
            method=PipsPlusPlus.encode_frames,
        )
        coords, _ = model.apply(params, fmaps, trajs0[0], iters=iters)

        np.testing.assert_allclose(
            np.asarray(coords), ref_coords, rtol=0, atol=atol
        )
