"""SuperPoint / SuperGlue tests (tiny random config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_pt_tpu.models.tracker.superglue.superpoint import SuperPoint, simple_nms
from sam_pt_tpu.models.tracker.superglue.superglue import (
    SuperGlue,
    log_sinkhorn,
    normalize_keypoints,
)
from sam_pt_tpu.models.tracker.superglue.tracker import SuperGluePointTracker


class TestSuperPoint:
    def test_nms_keeps_local_maxima(self):
        s = jnp.zeros((16, 16))
        s = s.at[4, 4].set(1.0).at[4, 6].set(0.5)
        out = np.asarray(simple_nms(s, 2))
        assert out[4, 4] == 1.0
        assert out[4, 6] == 0.0  # suppressed by the nearby stronger max

    def test_detect_contract(self, rng):
        sp = SuperPoint(max_keypoints=32, keypoint_threshold=0.0)
        img = jnp.asarray(rng.uniform(size=(48, 64)).astype(np.float32))
        params = sp.init(jax.random.PRNGKey(0), img)
        out = sp.apply(params, img)
        assert out["keypoints"].shape == (32, 2)
        assert out["descriptors"].shape == (32, 256)
        norms = np.linalg.norm(np.asarray(out["descriptors"]), axis=-1)
        np.testing.assert_allclose(norms[np.asarray(out["valid"])], 1.0,
                                   atol=1e-4)


class TestSinkhorn:
    def test_rows_sum_to_marginals(self):
        scores = jnp.asarray(np.random.default_rng(0)
                             .standard_normal((5, 7)).astype(np.float32))
        z = log_sinkhorn(scores, jnp.float32(0.5), 50)
        p = np.exp(np.asarray(z))
        # after the exp(norm) rescaling, each keypoint row sums to 1
        np.testing.assert_allclose(p[:-1].sum(axis=1), 1.0, atol=1e-3)

    def test_normalize_keypoints_centered(self):
        k = jnp.array([[50.0, 25.0]])
        out = np.asarray(normalize_keypoints(k, (50, 100)))
        np.testing.assert_allclose(out, [[0.0, 0.0]], atol=1e-6)


class TestTracker:
    def test_contract_and_statefulness(self, rng):
        tr = SuperGluePointTracker(
            positive_points_per_mask=3, negative_points_per_mask=1,
            max_keypoints=32, sinkhorn_iterations=10,
        )
        tr.superpoint = SuperPoint(max_keypoints=32, keypoint_threshold=0.0)
        tr.superglue = SuperGlue(gnn_layers=1, sinkhorn_iterations=10,
                                 match_threshold=0.0)
        tr.init_params(jax.random.PRNGKey(0), 48, 64)

        t, h, w = 3, 48, 64
        rgbs = rng.integers(0, 255, size=(1, t, h, w, 3)).astype(np.uint8)
        qp = rng.uniform(0, 40, size=(1, 8, 3)).astype(np.float32)
        qp[..., 0] = 0

        with pytest.raises(AssertionError):
            tr.forward(rgbs, qp)  # masks not set

        masks = np.zeros((2, h, w), np.float32)
        masks[0, 8:24, 8:30] = 1
        masks[1, 30:44, 34:60] = 1
        tr.set_masks(masks)
        traj, vis = tr.forward(rgbs, qp)
        assert traj.shape == (1, t, 8, 2)
        assert vis.shape == (1, t, 8)
        assert tr.masks is None  # consumed
        # frame 0 carries the query points verbatim
        np.testing.assert_allclose(traj[0, 0], qp[0, :, 1:], atol=1e-5)
