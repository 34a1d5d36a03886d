"""Unit tests for sampling primitives vs. torch reference semantics."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sam_pt_tpu.ops.sampling import (
    bilinear_sample,
    bilinear_sample_nchw,
    patch_sample,
    separable_neighborhood_sample,
)


def torch_grid_sample_at_pixels(img_nchw, coords_xy, align_corners, padding="zeros"):
    """Sample torch grid_sample at raw pixel coordinates."""
    n, c, h, w = img_nchw.shape
    x = coords_xy[..., 0]
    y = coords_xy[..., 1]
    if align_corners:
        gx = 2 * x / (w - 1) - 1
        gy = 2 * y / (h - 1) - 1
    else:
        gx = ((x + 0.5) / w) * 2 - 1
        gy = ((y + 0.5) / h) * 2 - 1
    grid = torch.stack([gx, gy], dim=-1)
    return F.grid_sample(
        img_nchw, grid, align_corners=align_corners, padding_mode=padding,
        mode="bilinear",
    )


class TestBilinearSample:
    def test_matches_grid_sample_zero_pad(self, rng):
        img = rng.standard_normal((1, 3, 13, 17)).astype(np.float32)
        pts = rng.uniform(-2, 20, size=(1, 40, 1, 2)).astype(np.float32)
        ref = torch_grid_sample_at_pixels(
            torch.from_numpy(img), torch.from_numpy(pts), align_corners=False
        ).numpy()[0, :, :, 0]  # [C, N]
        got = bilinear_sample(
            jnp.asarray(img[0].transpose(1, 2, 0)),
            jnp.asarray(pts[0, :, 0, 0]),
            jnp.asarray(pts[0, :, 0, 1]),
            pad_mode="zeros",
        )  # [N, C]
        np.testing.assert_allclose(np.asarray(got).T, ref, atol=1e-5)

    def test_clamp_matches_reference_inbounds(self, rng):
        """In-bounds coords: clamp and zeros agree with torch border padding."""
        img = rng.standard_normal((2, 4, 9, 11)).astype(np.float32)
        x = rng.uniform(0, 10, size=(2, 25)).astype(np.float32)
        y = rng.uniform(0, 8, size=(2, 25)).astype(np.float32)
        pts = torch.from_numpy(np.stack([x, y], -1))[:, :, None, :]
        ref = torch_grid_sample_at_pixels(
            torch.from_numpy(img), pts, align_corners=True, padding="border"
        ).numpy()[:, :, :, 0]
        got = bilinear_sample_nchw(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_clamp_out_of_bounds(self):
        img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1)
        out = bilinear_sample(img, jnp.array([-5.0, 100.0]), jnp.array([-5.0, 100.0]))
        np.testing.assert_allclose(np.asarray(out)[:, 0], [0.0, 11.0])


class TestSeparableNeighborhood:
    def test_matches_dense_grid_sample(self, rng):
        """Matmul-based neighborhood sampling == grid_sample on the dense grid.

        Replicates the PIPS CorrBlock.sample pattern (reference pips.py:364-391):
        align_corners=True normalization, zero padding.
        """
        h, w, r = 12, 15, 3
        plane = rng.standard_normal((5, h, w)).astype(np.float32)
        cx = rng.uniform(-1, w + 1, size=(5,)).astype(np.float32)
        cy = rng.uniform(-1, h + 1, size=(5,)).astype(np.float32)
        d = np.linspace(-r, r, 2 * r + 1).astype(np.float32)

        got = separable_neighborhood_sample(
            jnp.asarray(plane), jnp.asarray(cx), jnp.asarray(cy),
            jnp.asarray(d), jnp.asarray(d),
        )  # [5, K, K]

        # torch reference: grid over (dy, dx) meshgrid, align_corners=True
        dy, dx = np.meshgrid(d, d, indexing="ij")
        coords = np.stack(
            [cx[:, None, None] + dx, cy[:, None, None] + dy], axis=-1
        )  # [5, K, K, 2]
        ref = torch_grid_sample_at_pixels(
            torch.from_numpy(plane[:, None]),
            torch.from_numpy(coords),
            align_corners=True,
        ).numpy()[:, 0]
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


class TestPatchSample:
    def test_matches_reference_patch_extraction(self, rng):
        """Matches sam_pt.py:597-622 grid_sample patch extraction."""
        h, w, c, p = 20, 24, 3, 3
        img = rng.standard_normal((h, w, c)).astype(np.float32)
        pts = rng.uniform(0, 19, size=(7, 2)).astype(np.float32)

        got = patch_sample(jnp.asarray(img), jnp.asarray(pts), p)  # [7, 9, 3]

        half = p // 2
        offs = np.arange(-half, half + 1)
        tpl = np.stack(np.meshgrid(offs, offs, indexing="ij"), -1).reshape(-1, 2)
        # reference template uses meshgrid(t, t) then stack -> (dy_like, dx_like)
        # applied as xy offsets; replicate exactly:
        patches_xy = pts[:, None, :] + tpl[None, :, :]
        coords = torch.from_numpy(patches_xy.astype(np.float32))[None]
        ref = torch_grid_sample_at_pixels(
            torch.from_numpy(img.transpose(2, 0, 1)[None]),
            coords, align_corners=False,
        ).numpy()[0].transpose(1, 2, 0)  # [7, 9, 3]

        # our patch_sample uses (dy rows, dx cols); the reference template
        # uses meshgrid(t, t) which produces (a, b) pairs added as (x, y).
        # Check as sets per point: reorder ours to the reference layout.
        got_np = np.asarray(got).reshape(7, p, p, c)
        got_reordered = got_np.transpose(0, 2, 1, 3).reshape(7, p * p, c)
        np.testing.assert_allclose(got_reordered, ref, atol=1e-5)
