"""RAFT model + tracker tests (tiny random config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_pt_tpu.models.tracker.raft.model import (
    Raft,
    all_pairs_correlation,
    convex_upsample,
    lookup_correlation,
)
from sam_pt_tpu.models.tracker.raft.tracker import RaftPointTracker


class TestRaftCore:
    def test_correlation_shapes(self, rng):
        f1 = jnp.asarray(rng.standard_normal((1, 6, 8, 4)).astype(np.float32))
        pyr = all_pairs_correlation(f1, f1, 3)
        assert pyr[0].shape == (1, 48, 6, 8)
        assert pyr[1].shape == (1, 48, 3, 4)
        coords = jnp.zeros((1, 6, 8, 2))
        feat = lookup_correlation(pyr, coords, 2)
        assert feat.shape == (1, 6, 8, 3 * 25)

    def test_convex_upsample_constant_flow(self):
        # constant coarse flow with uniform weights -> constant x8 flow in the
        # interior (border cells see zero padding, same as torch's unfold)
        flow = jnp.ones((1, 3, 4, 2)) * 2.0
        mask = jnp.zeros((1, 3, 4, 64 * 9))
        up = convex_upsample(flow, mask)
        assert up.shape == (1, 24, 32, 2)
        np.testing.assert_allclose(np.asarray(up)[0, 8:16, 8:24], 16.0, atol=1e-5)

    def test_forward_shapes(self):
        model = Raft(corr_levels=2, corr_radius=2, hidden=16, context=16)
        img = jnp.zeros((1, 32, 40, 3))
        params = model.init(jax.random.PRNGKey(0), img, img, iters=1)
        flow = model.apply(params, img, img, iters=2)
        assert flow.shape == (1, 32, 40, 2)


class TestRaftTracker:
    def test_contract(self, rng):
        tr = RaftPointTracker(iters=2, flow_chunk=2)
        tr.model = Raft(corr_levels=2, corr_radius=2, hidden=16, context=16)
        tr.init_params(jax.random.PRNGKey(0), 32, 40)
        t, h, w = 5, 32, 40
        rgbs = rng.integers(0, 255, size=(1, t, h, w, 3)).astype(np.uint8)
        qp = np.array([[[0, 5.0, 6.0], [2, 20.0, 15.0]]], np.float32)
        traj, vis = tr.forward(rgbs, qp)
        assert traj.shape == (1, t, 2, 2)
        assert vis.shape == (1, t, 2)
        # query frame pinning
        np.testing.assert_allclose(traj[0, 0, 0], [5.0, 6.0], atol=1e-5)
        np.testing.assert_allclose(traj[0, 2, 1], [20.0, 15.0], atol=1e-5)
