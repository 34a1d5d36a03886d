"""Unit tests for resize / color / posemb ops vs. torch reference semantics."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sam_pt_tpu.ops.resize import (
    get_longest_side_target_hw,
    resize_bilinear,
    resize_nearest,
)
from sam_pt_tpu.ops.color import rgb_to_gray, rgb_to_lab
from sam_pt_tpu.ops.posemb import get_3d_sincos_embedding, posemb_sincos_2d_xy


class TestResize:
    def test_bilinear_half_pixel_upsample(self, rng):
        x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(14, 20),
            mode="bilinear", align_corners=False,
        ).numpy().transpose(0, 2, 3, 1)
        got = resize_bilinear(jnp.asarray(x), (14, 20))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_bilinear_align_corners_both_directions(self, rng):
        x = rng.standard_normal((1, 16, 12, 4)).astype(np.float32)
        for size in [(8, 6), (31, 25)]:
            ref = F.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), size=size,
                mode="bilinear", align_corners=True,
            ).numpy().transpose(0, 2, 3, 1)
            got = resize_bilinear(jnp.asarray(x), size, align_corners=True)
            np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_nearest(self, rng):
        x = (rng.uniform(0, 5, size=(1, 10, 13, 2)) > 2).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(23, 7),
            mode="nearest",
        ).numpy().transpose(0, 2, 3, 1)
        got = resize_nearest(jnp.asarray(x), (23, 7))
        np.testing.assert_allclose(np.asarray(got), ref)

    def test_longest_side_shape(self):
        assert get_longest_side_target_hw(480, 910, 1024) == (540, 1024)
        assert get_longest_side_target_hw(1080, 1920, 1024) == (576, 1024)

    def test_antialias_downsample_matches_torch_antialias(self, rng):
        """PIL-style triangle filter == torch antialias=True bilinear."""
        x = rng.standard_normal((1, 32, 48, 3)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(8, 12),
            mode="bilinear", align_corners=False, antialias=True,
        ).numpy().transpose(0, 2, 3, 1)
        got = resize_bilinear(jnp.asarray(x), (8, 12), antialias=True)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


class TestColor:
    def test_rgb_to_lab_known_values(self):
        # White -> L=100, a=b=0; black -> 0,0,0; sRGB red -> ~(53.24, 80.09, 67.20)
        rgb = jnp.array(
            [[255, 255, 255], [0, 0, 0], [255, 0, 0]], dtype=jnp.uint8
        )
        lab = np.asarray(rgb_to_lab(rgb))
        # float32 matrix rounding amplified by the 500x/200x Lab scales gives
        # ~0.1 absolute drift on a/b — far below patch-similarity sensitivity.
        np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.15)
        np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=1e-3)
        np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.15)

    def test_rgb_to_gray(self):
        rgb = jnp.array([[100, 150, 200]], dtype=jnp.float32)
        expected = 0.299 * 100 + 0.587 * 150 + 0.114 * 200
        np.testing.assert_allclose(float(rgb_to_gray(rgb)[0]), expected, atol=1e-4)


def reference_get_3d_embedding(xyz, C, cat_coords=True):
    """Literal numpy transcription of reference misc.py:30 for testing."""
    B, N, _ = xyz.shape
    x, y, z = xyz[..., 0:1], xyz[..., 1:2], xyz[..., 2:3]
    div_term = (np.arange(0, C, 2, dtype=np.float32) * (1000.0 / C)).reshape(1, 1, C // 2)
    out = []
    for v in (x, y, z):
        pe = np.zeros((B, N, C), dtype=np.float32)
        pe[..., 0::2] = np.sin(v * div_term)
        pe[..., 1::2] = np.cos(v * div_term)
        out.append(pe)
    pe = np.concatenate(out, axis=2)
    if cat_coords:
        pe = np.concatenate([pe, xyz], axis=2)
    return pe


class TestPosemb:
    def test_3d_embedding_matches_reference(self, rng):
        xyz = rng.standard_normal((2, 5, 3)).astype(np.float32) * 10
        ref = reference_get_3d_embedding(xyz, 64)
        got = np.asarray(get_3d_sincos_embedding(jnp.asarray(xyz), 64))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_2d_embedding_shape(self, rng):
        xy = rng.standard_normal((2, 6, 2)).astype(np.float32)
        out = posemb_sincos_2d_xy(jnp.asarray(xy), 64, cat_coords=True)
        assert out.shape == (2, 6, 66)


class TestPCAVizAndSummWriter:
    """Feature-PCA visualization + disk SummWriter (reference
    improc.py:26-131, :375 replacement)."""

    def test_pca_feature_image_shapes(self, rng):
        from sam_pt_tpu.utils.viz import pca_feature_image

        feat = rng.standard_normal((12, 16, 8)).astype(np.float32)
        img = pca_feature_image(feat)
        assert img.shape == (12, 16, 3) and img.dtype == np.uint8

        feats = rng.standard_normal((3, 12, 16, 8)).astype(np.float32)
        imgs = pca_feature_image(feats)
        assert imgs.shape == (3, 12, 16, 3)
        # structure must survive: two blocks with distinct features should
        # map to distinct colors
        feat2 = np.zeros((10, 10, 6), np.float32)
        feat2[:5] = rng.standard_normal(6)
        feat2[5:] = rng.standard_normal(6)
        img2 = pca_feature_image(feat2 + 0.01 * rng.standard_normal(
            (10, 10, 6)).astype(np.float32))
        assert np.abs(img2[:5].mean(axis=(0, 1)).astype(int)
                      - img2[5:].mean(axis=(0, 1)).astype(int)).max() > 30

    def test_summ_writer(self, tmp_path, rng):
        from sam_pt_tpu.utils.viz import SummWriter

        sw = SummWriter(str(tmp_path), global_step=4, log_freq=2)
        assert sw.save_this
        sw.summ_rgb("rgb", rng.integers(0, 255, size=(8, 8, 3)).astype(
            np.uint8))
        sw.summ_feat("feat", rng.standard_normal((8, 8, 5)).astype(
            np.float32))
        sw.summ_oned("one", rng.standard_normal((8, 8)))
        names = sorted(p.name for p in tmp_path.iterdir())
        assert any("rgb" in n for n in names)
        assert any("feat" in n for n in names)
        assert any("one" in n for n in names)
        # gated off-step writer writes nothing
        sw2 = SummWriter(str(tmp_path / "off"), global_step=3, log_freq=2)
        sw2.summ_rgb("rgb", np.zeros((4, 4, 3), np.uint8))
        assert not list((tmp_path / "off").iterdir())
