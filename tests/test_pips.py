"""PIPS model + tracker tests.

Numerical checks pin the correlation pyramid / neighborhood sampling to a
naive torch transcription of the reference pattern (pips.py:344-407); tracker
tests check the linking/stitching invariants the reference asserts at runtime
(pips/tracker.py:185-194).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sam_pt_tpu.models.tracker.pips.model import (
    BasicEncoder,
    Pips,
    correlation_pyramid,
    sample_corr_pyramid,
)
from sam_pt_tpu.models.tracker.pips.tracker import PipsPointTracker


def naive_torch_corr_sample(fmaps, targets, coords, num_levels, radius):
    """Torch transcription of CorrBlock.corr + .sample (reference pips.py)."""
    s, h, w, c = fmaps.shape
    n = targets.shape[1]
    fm = torch.from_numpy(np.ascontiguousarray(fmaps.transpose(0, 3, 1, 2)))
    tg = torch.from_numpy(targets)

    pyramid = []
    cur = fm
    for _ in range(num_levels):
        hh, ww = cur.shape[-2:]
        corr = torch.einsum("snc,schw->snhw", tg, cur) / np.sqrt(c)
        pyramid.append(corr)
        cur = F.avg_pool2d(cur, 2, stride=2)

    outs = []
    r = radius
    d = torch.linspace(-r, r, 2 * r + 1)
    dy, dx = torch.meshgrid(d, d, indexing="ij")
    for lvl, corr in enumerate(pyramid):
        hh, ww = corr.shape[-2:]
        centers = torch.from_numpy(coords) / (2 ** lvl)  # [S, N, 2]
        # Reference CorrBlock.sample adds the ROW index offset to x and the
        # column offset to y (pips.py:376-385) — replicate that x-major
        # window flattening exactly.
        cx = centers[..., 0][..., None, None] + dy
        cy = centers[..., 1][..., None, None] + dx
        gx = 2 * cx / (ww - 1) - 1
        gy = 2 * cy / (hh - 1) - 1
        grid = torch.stack([gx, gy], dim=-1).reshape(s * n, 2 * r + 1, 2 * r + 1, 2)
        planes = corr.reshape(s * n, 1, hh, ww)
        sampled = F.grid_sample(planes, grid.float(), align_corners=True)
        outs.append(sampled.reshape(s, n, -1))
    return torch.cat(outs, dim=-1).numpy()


class TestCorrelation:
    def test_pyramid_sampling_matches_torch(self, rng):
        s, h, w, c, n = 3, 16, 20, 8, 5
        fmaps = rng.standard_normal((s, h, w, c)).astype(np.float32)
        targets = rng.standard_normal((s, n, c)).astype(np.float32)
        coords = (rng.uniform(0, 15, size=(s, n, 2))).astype(np.float32)

        pyr = correlation_pyramid(jnp.asarray(fmaps), jnp.asarray(targets), 3)
        got = sample_corr_pyramid(pyr, jnp.asarray(coords), 2)
        ref = naive_torch_corr_sample(fmaps, targets, coords, 3, 2)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


class TestPipsModel:
    def test_window_forward_shapes(self):
        model = Pips(s=4, stride=4, latent_dim=16, hidden_dim=32, mixer_depth=2)
        fmaps = jnp.zeros((4, 8, 10, 16))
        xys = jnp.array([[3.0, 5.0], [10.0, 12.0]])
        params = model.init(jax.random.PRNGKey(0), fmaps, xys, iters=1)
        coords, vis, ffeat0 = model.apply(params, fmaps, xys, iters=2)
        assert coords.shape == (4, 2, 2)
        assert vis.shape == (4, 2)
        assert ffeat0.shape == (2, 16)
        # query frame locked to input coords
        np.testing.assert_allclose(np.asarray(coords[0]), np.asarray(xys), atol=1e-5)

    def test_encoder_output_stride(self):
        enc = BasicEncoder(output_dim=16, stride=4)
        x = jnp.zeros((2, 32, 40, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 8, 10, 16)


class TestPipsTracker:
    @pytest.fixture(scope="class")
    def tracker(self):
        tr = PipsPointTracker(stride=4, s=4, iters=2)
        tr.model = Pips(s=4, stride=4, latent_dim=16, hidden_dim=32,
                        mixer_depth=2)
        tr.init_params(jax.random.PRNGKey(0), 32, 40)
        return tr

    def test_end_to_end_contract(self, tracker, rng):
        t, h, w, n = 10, 32, 40, 3
        rgbs = rng.integers(0, 255, size=(1, t, h, w, 3)).astype(np.uint8)
        qp = np.array([[[0, 5.0, 6.0], [4, 20.0, 15.0], [9, 30.0, 25.0]]],
                      np.float32)
        traj, vis = tracker.forward(rgbs, qp)
        assert traj.shape == (1, t, n, 2)
        assert vis.shape == (1, t, n)
        # stitching invariant: trajectory at the query frame == query point,
        # visibility 1 (reference pips/tracker.py:185-194 asserts)
        for i in range(n):
            qf = int(qp[0, i, 0])
            np.testing.assert_allclose(traj[0, qf, i], qp[0, i, 1:], atol=1e-4)
            assert vis[0, qf, i] == 1.0
