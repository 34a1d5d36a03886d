"""SAM stack tests: shape contracts + numerical micro-references.

The decomposed rel-pos attention bias is checked against an independent torch
transcription of the published algorithm; full-checkpoint numerical parity is
exercised separately by the checkpoint converter tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sam_pt_tpu.models.sam.image_encoder import (
    Attention,
    ImageEncoderViT,
    LayerNorm2d,
    VIT_VARIANTS,
    window_partition,
    window_unpartition,
)
from sam_pt_tpu.models.sam.mask_decoder import MaskDecoder
from sam_pt_tpu.models.sam.prompt_encoder import PromptEncoder
from sam_pt_tpu.models.sam.sam_model import Sam

TINY = dict(embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,),
            window_size=2)


class TestWindowing:
    def test_partition_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 10, 12, 8)).astype(np.float32))
        wins, padded = window_partition(x, 4)
        assert wins.shape == (2 * 3 * 3, 4, 4, 8)
        back = window_unpartition(wins, 4, padded, (10, 12))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestLayerNorm2d:
    def test_matches_torch_channel_norm(self, rng):
        x = rng.standard_normal((2, 5, 6, 16)).astype(np.float32)
        ln = LayerNorm2d()
        params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # non-trivial weights
        params = {"params": {
            "weight": jnp.asarray(rng.standard_normal(16).astype(np.float32)),
            "bias": jnp.asarray(rng.standard_normal(16).astype(np.float32)),
        }}
        got = ln.apply(params, jnp.asarray(x))

        t = torch.from_numpy(x)
        mu = t.mean(dim=-1, keepdim=True)
        var = ((t - mu) ** 2).mean(dim=-1, keepdim=True)
        ref = (t - mu) / torch.sqrt(var + 1e-6)
        ref = ref * torch.from_numpy(np.asarray(params["params"]["weight"]))
        ref = ref + torch.from_numpy(np.asarray(params["params"]["bias"]))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def torch_decomposed_rel_pos_reference(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    """Independent torch transcription of the published ViTDet algorithm."""
    def get_rel_pos(q_size, k_size, rel_pos):
        max_rel_dist = 2 * max(q_size, k_size) - 1
        assert rel_pos.shape[0] == max_rel_dist
        q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
        k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
        rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
        return rel_pos[rel.long()]

    q_h, q_w = q_hw
    k_h, k_w = k_hw
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B = q.shape[0]
    r_q = q.reshape(B, q_h, q_w, -1)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.view(B, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.view(B, q_h * q_w, k_h * k_w)


class TestRelPosAttention:
    def test_bias_matches_torch_reference(self, rng):
        from sam_pt_tpu.models.sam.image_encoder import _add_decomposed_rel_pos

        h = w = 5
        hd = 8
        attn = rng.standard_normal((3, h * w, h * w)).astype(np.float32)
        q = rng.standard_normal((3, h * w, hd)).astype(np.float32)
        rph = rng.standard_normal((2 * h - 1, hd)).astype(np.float32)
        rpw = rng.standard_normal((2 * w - 1, hd)).astype(np.float32)

        got = _add_decomposed_rel_pos(
            jnp.asarray(attn), jnp.asarray(q), jnp.asarray(rph),
            jnp.asarray(rpw), (h, w), (h, w),
        )
        ref = torch_decomposed_rel_pos_reference(
            torch.from_numpy(attn), torch.from_numpy(q),
            torch.from_numpy(rph), torch.from_numpy(rpw), (h, w), (h, w),
        )
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4)


class TestEncoderShapes:
    def test_tiny_encoder_output(self):
        enc = ImageEncoderViT(img_size=64, out_chans=16, **TINY)
        x = jnp.zeros((1, 64, 64, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (1, 4, 4, 16)

    def test_variants_table(self):
        assert VIT_VARIANTS["vit_h"]["depth"] == 32
        assert VIT_VARIANTS["vit_l"]["embed_dim"] == 1024


class TestPromptEncoder:
    @pytest.fixture
    def pe(self):
        m = PromptEncoder(
            embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64)
        )
        pts = jnp.zeros((2, 3, 2))
        lbl = jnp.zeros((2, 3), jnp.int32)
        masks = jnp.zeros((2, 16, 16, 1))
        params = m.init(jax.random.PRNGKey(1), pts, lbl, masks)
        return m, params

    def test_sparse_dense_shapes(self, pe):
        m, params = pe
        pts = jnp.array([[[5.0, 6.0], [1.0, 2.0], [0.0, 0.0]]] * 2)
        lbl = jnp.array([[1, 0, -1]] * 2, jnp.int32)
        sparse, dense = m.apply(params, pts, lbl)
        assert sparse.shape == (2, 3, 32)
        assert dense.shape == (2, 4, 4, 32)

    def test_padding_uses_not_a_point(self, pe):
        m, params = pe
        pts = jnp.array([[[5.0, 6.0]]])
        # padding label -> embedding must equal not_a_point_embed exactly
        sparse, _ = m.apply(params, pts, jnp.array([[-1]], jnp.int32))
        expected = params["params"]["not_a_point_embed"]
        np.testing.assert_allclose(
            np.asarray(sparse[0, 0]), np.asarray(expected), atol=1e-6
        )

    def test_mask_valid_switch(self, pe):
        m, params = pe
        pts = jnp.zeros((2, 1, 2))
        lbl = jnp.ones((2, 1), jnp.int32)
        mask_in = jnp.ones((2, 16, 16, 1))
        _, dense_valid = m.apply(params, pts, lbl, mask_in,
                                 jnp.array([True, False]))
        no_mask = params["params"]["no_mask_embed"]
        np.testing.assert_allclose(
            np.asarray(dense_valid[1, 0, 0]), np.asarray(no_mask), atol=1e-6
        )
        assert not np.allclose(np.asarray(dense_valid[0, 0, 0]), np.asarray(no_mask))


class TestMaskDecoder:
    def test_output_shapes(self):
        dec = MaskDecoder(transformer_dim=32)
        emb = jnp.zeros((2, 4, 4, 32))
        pe = jnp.zeros((1, 4, 4, 32))
        sparse = jnp.zeros((2, 5, 32))
        dense = jnp.zeros((2, 4, 4, 32))
        params = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
        masks, iou = dec.apply(params, emb, pe, sparse, dense)
        assert masks.shape == (2, 4, 16, 16)
        assert iou.shape == (2, 4)


class TestSamEndToEnd:
    def test_tiny_sam_forward(self):
        model = Sam(encoder_variant="vit_b", image_size=64)
        # monkeypatch variant dims for a tiny smoke config
        import sam_pt_tpu.models.sam.image_encoder as ie
        ie.VIT_VARIANTS["vit_tiny_test"] = TINY
        model = Sam(encoder_variant="vit_tiny_test", image_size=64)
        imgs = jnp.zeros((1, 64, 64, 3))
        pts = jnp.array([[[10.0, 20.0], [0.0, 0.0]]])
        lbl = jnp.array([[1, -1]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), imgs, pts, lbl)
        masks, iou = model.apply(params, imgs, pts, lbl)
        assert masks.shape == (1, 4, 16, 16)
        assert iou.shape == (1, 4)


class TestPadTokenMasking:
    """The fixed padded prompt layout must be numerically identical to the
    reference's visible-points-plus-one-pad prompts (segment_anything
    appends exactly one not-a-point pad when no box is given)."""

    def test_padded_equals_visible_plus_one_pad(self, rng):
        from sam_pt_tpu.models.sam.sam_model import Sam
        from sam_pt_tpu.utils.testing import build_tiny_sam

        model, params = build_tiny_sam(64)
        emb = model.apply(
            params,
            jnp.asarray(rng.random((1, 64, 64, 3)) * 255, jnp.float32),
            method=Sam.encode_images,
        )

        pts = rng.uniform(5, 59, size=(1, 3, 2)).astype(np.float32)
        lbl = np.array([[1, 1, 0]], np.int32)

        # visible-only layout (decode_masks itself appends the one pad)
        m_ref, iou_ref = model.apply(
            params, emb, jnp.asarray(pts), jnp.asarray(lbl),
            method=Sam.decode_masks,
        )

        # heavily padded layout: same 3 visible points + 5 pad slots
        pad_pts = np.concatenate(
            [pts, np.zeros((1, 5, 2), np.float32)], axis=1
        )
        pad_lbl = np.concatenate(
            [lbl, np.full((1, 5), -1, np.int32)], axis=1
        )
        m_pad, iou_pad = model.apply(
            params, emb, jnp.asarray(pad_pts), jnp.asarray(pad_lbl),
            method=Sam.decode_masks,
        )

        np.testing.assert_allclose(
            np.asarray(m_pad), np.asarray(m_ref), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(iou_pad), np.asarray(iou_ref), rtol=0, atol=1e-5
        )


class TestCropPadTokens:
    """Opt-in encoder pad-token cropping (Sam.crop_pad_tokens): square
    inputs (no padding) must be bit-identical to the uncropped path; padded
    inputs run the transformer on the cropped grid and zero-fill the pad
    region of the returned embedding."""

    def test_square_input_is_identity(self, rng):
        from sam_pt_tpu.utils.testing import build_tiny_sam
        from sam_pt_tpu.models.sam.sam_model import Sam

        model, params = build_tiny_sam(64)
        cropped = model.clone(crop_pad_tokens=True)
        img = jnp.asarray(
            rng.uniform(0, 255, size=(1, 64, 64, 3)).astype(np.float32))
        a = model.apply(params, img, method=Sam.encode_images)
        b = cropped.apply(params, img, method=Sam.encode_images)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_padded_input_crops_and_zero_fills(self, rng):
        from sam_pt_tpu.utils.testing import build_tiny_sam
        from sam_pt_tpu.models.sam.sam_model import Sam

        model, params = build_tiny_sam(64)
        cropped = model.clone(crop_pad_tokens=True)
        img = jnp.asarray(
            rng.uniform(0, 255, size=(1, 48, 64, 3)).astype(np.float32))
        emb = np.asarray(cropped.apply(params, img, method=Sam.encode_images))
        assert emb.shape == (1, 4, 4, 256)
        # valid token rows = ceil(48/16) = 3; row 3 is the zero-filled pad
        assert np.all(emb[:, 3] == 0)
        assert np.any(emb[:, :3] != 0)
        # and full decode still runs on the padded-back embedding
        pts = jnp.asarray(np.array([[[10.0, 20.0]]], np.float32))
        lbl = jnp.asarray(np.array([[1]], np.int32))
        masks, iou = cropped.apply(params, jnp.asarray(emb), pts, lbl,
                                   method=Sam.decode_masks)
        assert masks.shape[0] == 1 and iou.shape == (1, 4)

    def test_rectangular_cropped_global_grid_routes_to_naive(self, rng):
        """A cropped GLOBAL block with a rectangular grid and lane-padded
        heads (< 1024 tokens) must not hit the square-window fused kernel
        (win*win == n assert) — regression for the crop_pad_tokens routing
        on very wide/tall frames."""
        attn = Attention(num_heads=2, use_rel_pos=True, input_size=(8, 8),
                         padded_head_dim=128, cropped=True)
        # h=3, w=5: rectangular, h*w = 15 < 1024; hdp = 128 lane-aligned
        x = jnp.asarray(
            rng.standard_normal((1, 3, 5, 128)).astype(np.float32))
        params = attn.init(jax.random.PRNGKey(0), x)
        y = attn.apply(params, x)
        assert y.shape == (1, 3, 5, 128)
        assert np.isfinite(np.asarray(y)).all()
