"""TinyViT (MobileSAM) encoder tests."""
import jax
import jax.numpy as jnp
import numpy as np

from sam_pt_tpu.models.sam.tiny_vit import TinyViT, _rel_bias_index
from sam_pt_tpu.models.sam.sam_model import Sam


class TestTinyViT:
    def test_output_grid(self):
        # small input: 128 -> /4 stem = 32 -> /8 -> /16 -> stride-1 merge = 8
        m = TinyViT(img_size=128, embed_dims=(16, 24, 32, 320),
                    depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 10),
                    window_sizes=(4, 4, 4, 4), out_chans=32)
        x = jnp.zeros((1, 128, 128, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, 8, 8, 32)

    def test_rel_bias_index_symmetry(self):
        idx = _rel_bias_index(3)
        assert idx.shape == (9, 9)
        # symmetric offsets share slots
        assert idx[0, 1] == idx[1, 0]
        assert idx.max() + 1 == 9  # 3x3 unique |offset| pairs

    def test_sam_with_tinyvit_variant(self):
        model = Sam(encoder_variant="vit_t", image_size=128)
        imgs = jnp.zeros((1, 128, 128, 3))
        pts = jnp.zeros((1, 2, 2))
        lbl = jnp.zeros((1, 2), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), imgs, pts, lbl)
        masks, iou = model.apply(params, imgs, pts, lbl)
        assert masks.shape == (1, 4, 32, 32)
