"""PIPS++ model + tracker tests (tiny random config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_pt_tpu.models.tracker.pips2.model import (
    DeltaBlock1d,
    PipsPlusPlus,
    instance_norm_1d,
)
from sam_pt_tpu.models.tracker.pips2.tracker import PipsPlusPlusPointTracker


class TestModel:
    def test_instance_norm_1d_matches_torch(self, rng):
        import torch

        x = rng.standard_normal((2, 7, 5)).astype(np.float32)
        got = np.asarray(instance_norm_1d(jnp.asarray(x)))
        ref = torch.nn.functional.instance_norm(
            torch.from_numpy(x).permute(0, 2, 1)
        ).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_delta_block_channels(self):
        db = DeltaBlock1d(latent_dim=128)
        fcorr = jnp.zeros((3, 6, 588))
        flow = jnp.zeros((3, 6, 2))
        params = db.init(jax.random.PRNGKey(0), fcorr, flow)
        out = db.apply(params, fcorr, flow)
        assert out.shape == (3, 6, 2)
        # channel doubling every 2 blocks: final block at 1024
        assert params["params"]["block_7"]["conv2"]["kernel"].shape == (3, 1024, 1024)

    def test_window_forward(self):
        m = PipsPlusPlus(stride=4, latent_dim=16)
        fmaps = jnp.zeros((6, 8, 10, 16))
        coords = jnp.ones((6, 3, 2)) * 8.0
        params = m.init(jax.random.PRNGKey(0), fmaps, coords, None, iters=2)
        out, feats = m.apply(params, fmaps, coords, None, iters=2)
        assert out.shape == (6, 3, 2)
        np.testing.assert_allclose(np.asarray(out[0]), 8.0, atol=1e-4)
        assert len(feats) == 3


class TestTracker:
    def test_contract(self, rng):
        tr = PipsPlusPlusPointTracker(
            stride=4, max_sequence_length=4, iters=2, image_size=None,
        )
        tr.model = PipsPlusPlus(stride=4, latent_dim=16)
        tr.init_params(jax.random.PRNGKey(0), 32, 40)
        t, h, w = 7, 32, 40
        rgbs = rng.integers(0, 255, size=(1, t, h, w, 3)).astype(np.uint8)
        qp = np.array([[[0, 5.0, 6.0], [3, 20.0, 15.0], [6, 30.0, 20.0]]],
                      np.float32)
        traj, vis = tr.forward(rgbs, qp)
        assert traj.shape == (1, t, 3, 2)
        assert (vis == 1).all()
        for i in range(3):
            qf = int(qp[0, i, 0])
            np.testing.assert_allclose(traj[0, qf, i], qp[0, i, 1:], atol=1e-3)
