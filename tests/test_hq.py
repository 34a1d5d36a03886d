"""HQ-SAM decoder + end-to-end HQ Sam tests."""
import jax
import jax.numpy as jnp
import numpy as np

from sam_pt_tpu.models.sam.mask_decoder_hq import MaskDecoderHQ, select_hq_masks
from sam_pt_tpu.models.sam.sam_model import Sam
import sam_pt_tpu.utils.testing  # registers vit_tiny_test variant


class TestMaskDecoderHQ:
    def test_output_shapes(self):
        dec = MaskDecoderHQ(transformer_dim=32, vit_dim=16)
        emb = jnp.zeros((2, 4, 4, 32))
        pe = jnp.zeros((1, 4, 4, 32))
        sparse = jnp.zeros((2, 5, 32))
        dense = jnp.zeros((2, 4, 4, 32))
        interm = jnp.zeros((2, 4, 4, 16))
        params = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense, interm)
        masks, iou = dec.apply(params, emb, pe, sparse, dense, interm)
        assert masks.shape == (2, 5, 16, 16)  # 4 sam tokens + 1 hq
        assert iou.shape == (2, 4)

    def test_select_semantics(self, rng):
        masks = jnp.asarray(rng.standard_normal((2, 5, 8, 8)).astype(np.float32))
        iou = jnp.asarray(np.array([[0.1, 0.9, 0.2, 0.3],
                                    [0.5, 0.1, 0.2, 0.8]], np.float32))
        out, io = select_hq_masks(masks, iou, multimask_output=True)
        np.testing.assert_allclose(
            np.asarray(out[0, 0]), np.asarray(masks[0, 1] + masks[0, 4]),
            atol=1e-6)
        np.testing.assert_allclose(np.asarray(io), [[0.9], [0.8]])
        out, _ = select_hq_masks(masks, iou, False, hq_token_only=True)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(masks[:, 4]))


class TestSamHQ:
    def test_end_to_end_vit(self):
        model = Sam(encoder_variant="vit_tiny_test", image_size=64, use_hq=True)
        imgs = jnp.zeros((1, 64, 64, 3))
        pts = jnp.zeros((1, 2, 2))
        lbl = jnp.zeros((1, 2), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), imgs, pts, lbl)
        masks, iou = model.apply(params, imgs, pts, lbl)
        assert masks.shape == (1, 4, 16, 16)
        assert iou.shape == (1, 4)
