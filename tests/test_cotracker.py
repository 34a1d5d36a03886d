"""CoTracker model/tracker contract tests (tiny random config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_pt_tpu.models.tracker.cotracker.model import CoTracker, UpdateFormer
from sam_pt_tpu.models.tracker.cotracker.tracker import (
    CoTrackerPointTracker,
    get_points_on_a_grid,
)


class TestUpdateFormer:
    def test_shapes_and_interleaving(self):
        uf = UpdateFormer(space_depth=2, time_depth=2, input_dim=24,
                          hidden_size=32, num_heads=2, output_dim=10)
        x = jnp.zeros((5, 4, 24))  # [N, S, C]
        params = uf.init(jax.random.PRNGKey(0), x)
        y = uf.apply(params, x)
        assert y.shape == (5, 4, 10)
        names = set(params["params"].keys())
        assert "time_blocks_0" in names and "space_blocks_1" in names


class TestCoTrackerModel:
    def test_window_forward(self):
        m = CoTracker(s=4, stride=4, latent_dim=16, input_dim=456,
                      hidden_size=32, num_heads=2, space_depth=1, time_depth=2)
        fmaps = jnp.zeros((4, 8, 10, 16))
        coords = jnp.zeros((4, 3, 2))
        feats = jnp.zeros((3, 16))
        tm = jnp.ones((4, 3))
        params = m.init(jax.random.PRNGKey(0), fmaps, coords, feats, tm,
                        iters=1)
        c, v, f = m.apply(params, fmaps, coords, feats, tm, iters=2)
        assert c.shape == (4, 3, 2)
        assert v.shape == (4, 3)
        assert f.shape == (4, 3, 16)


class TestTracker:
    @pytest.fixture(scope="class")
    def tracker(self):
        tr = CoTrackerPointTracker(
            interp_shape=(32, 40), visibility_threshold=0.5,
            support_grid_size=2, support_grid_every_n_frames=6,
            s=4, stride=4, iters=2,
        )
        tr.model = CoTracker(s=4, stride=4, latent_dim=16, input_dim=456,
                             hidden_size=32, num_heads=2, space_depth=1,
                             time_depth=2)
        tr.init_params(jax.random.PRNGKey(0), 32, 40)
        return tr

    def test_contract(self, tracker, rng):
        t, h, w, n = 9, 48, 64, 3
        rgbs = rng.integers(0, 255, size=(1, t, h, w, 3)).astype(np.uint8)
        qp = np.array([[[0, 5.0, 6.0], [3, 20.0, 15.0], [8, 40.0, 25.0]]],
                      np.float32)
        traj, vis = tracker.forward(rgbs, qp)
        assert traj.shape == (1, t, n, 2)
        assert vis.shape == (1, t, n)
        assert set(np.unique(vis)).issubset({0.0, 1.0})

    def test_short_video_padding(self, tracker, rng):
        t = 2  # shorter than the window
        rgbs = rng.integers(0, 255, size=(1, t, 48, 64, 3)).astype(np.uint8)
        qp = np.array([[[0, 10.0, 10.0]]], np.float32)
        traj, vis = tracker.forward(rgbs, qp)
        assert traj.shape == (1, t, 1, 2)

    def test_support_grid(self):
        # v1 semantics: step = w // 64 margin on every side
        pts = get_points_on_a_grid(2, (384, 512))
        assert pts.shape == (1, 4, 2)
        np.testing.assert_allclose(pts[0, 0], [8.0, 8.0])
        np.testing.assert_allclose(pts[0, -1], [504.0, 376.0])
        # grid_size == 1 -> image center
        one = get_points_on_a_grid(1, (100, 200))
        np.testing.assert_allclose(one[0, 0], [100.0, 50.0])
