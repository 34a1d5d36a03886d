"""Tensor-parallel SAM encoder on the virtual 8-device CPU mesh.

Parity contract: TP-sharded encode (heads + MLP hidden sharded over a
'model' axis, Megatron-style contraction-sharded kernels with XLA-inserted
psums) must match the unsharded single-device encode to fp tolerance, both
on a pure model mesh and on a combined 2D (data x model) mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sam_pt_tpu.models.sam.image_encoder import ImageEncoderViT
from sam_pt_tpu.parallel.tensor_parallel import (
    create_tp_mesh,
    sam_tp_param_specs,
    shard_params_tp,
)

TINY = dict(
    img_size=64,
    patch_size=16,
    embed_dim=32,
    depth=3,
    num_heads=4,
    out_chans=16,
    window_size=2,
    global_attn_indexes=(1,),
)


def _build(tp_axis=None, dp_axis=None):
    enc = ImageEncoderViT(tp_axis=tp_axis, dp_axis=dp_axis, **TINY)
    return enc


class TestParamSpecs:
    def test_block_kernels_sharded_rest_replicated(self):
        enc = _build()
        params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        specs = sam_tp_param_specs(params, axis="model")
        p = specs["params"]
        blk = p["blocks_0"]
        # attention kernels replicated: the shard_map attention slices its
        # head block locally (and the XLA fallback head-shards activations)
        assert blk["attn"]["qkv"]["kernel"] == P()
        assert blk["attn"]["proj"]["kernel"] == P()
        assert blk["attn"]["qkv"]["bias"] == P()
        assert blk["attn"]["rel_pos_h"] == P()
        assert blk["mlp_lin1"]["kernel"] == P(None, "model")
        assert blk["mlp_lin1"]["bias"] == P("model")
        assert blk["mlp_lin2"]["kernel"] == P("model", None)
        assert blk["mlp_lin2"]["bias"] == P()
        assert p["patch_embed"]["kernel"] == P()
        assert p["pos_embed"] == P()
        assert p["neck_conv1"]["kernel"] == P()


class TestCreateTpMesh:
    def test_too_few_devices_raises(self):
        with pytest.raises(ValueError, match="devices"):
            create_tp_mesh(n_model=2 * len(jax.devices()))

    def test_explicit_overcommit_raises(self):
        with pytest.raises(ValueError, match="devices"):
            create_tp_mesh(n_model=len(jax.devices()), n_data=2)


class TestTensorParallelEncode:
    @pytest.fixture(scope="class")
    def ref(self):
        enc = _build()
        params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        # non-trivial weights everywhere (init gives zero rel-pos/pos-embed)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        rng = np.random.default_rng(7)
        leaves = [
            jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.1)
            for l in leaves
        ]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        x = jnp.asarray(
            rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
        )
        out = jax.jit(enc.apply)(params, x)
        return params, x, np.asarray(out)

    def test_model_only_mesh(self, ref):
        params, x, expect = ref
        mesh = create_tp_mesh(n_model=4, n_data=1)
        assert mesh.shape == {"data": 1, "model": 4}
        enc_tp = _build(tp_axis="model")
        params_tp = shard_params_tp(params, mesh, axis="model")
        x_repl = jax.device_put(x, NamedSharding(mesh, P()))
        with jax.set_mesh(mesh):
            out = jax.jit(enc_tp.apply)(params_tp, x_repl)
        np.testing.assert_allclose(np.asarray(out), expect, atol=2e-5)

    def test_2d_data_model_mesh(self, ref):
        params, x, expect = ref
        mesh = create_tp_mesh(n_model=4, n_data=2)
        enc_tp = _build(tp_axis="model", dp_axis="data")
        params_tp = shard_params_tp(params, mesh, axis="model")
        x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
        with jax.set_mesh(mesh):
            out = jax.jit(enc_tp.apply)(params_tp, x_sh)
        np.testing.assert_allclose(np.asarray(out), expect, atol=2e-5)

    def test_sam_level_tp(self, ref):
        """Sam.encode_images with tp_axis: the product surface, not just the
        bare encoder module."""
        import sam_pt_tpu.models.sam.image_encoder as _ie
        from sam_pt_tpu.models.sam.sam_model import Sam
        from sam_pt_tpu.utils.testing import build_tiny_sam

        model, params = build_tiny_sam()
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(
            rng.uniform(0, 255, size=(4, 64, 64, 3)).astype(np.float32)
        )
        expect = np.asarray(
            jax.jit(lambda p, x: model.apply(p, x, method=Sam.encode_images))(
                params, imgs
            )
        )

        mesh = create_tp_mesh(n_model=2, n_data=4)
        model_tp = Sam(
            encoder_variant="vit_tiny_test",
            image_size=64,
            tp_axis="model",
            dp_axis="data",
        )
        params_tp = shard_params_tp(params, mesh, axis="model")
        imgs_sh = jax.device_put(imgs, NamedSharding(mesh, P("data")))
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda p, x: model_tp.apply(p, x, method=Sam.encode_images)
            )(params_tp, imgs_sh)
        np.testing.assert_allclose(np.asarray(out), expect, atol=2e-5)

    def test_tp_predictor_matches_unsharded(self):
        """SamPredictor with a TP mesh: encode + decode parity vs plain."""
        from sam_pt_tpu.models.sam.factory import build_predictor
        from sam_pt_tpu.models.sam.predictor import SamPredictor
        from sam_pt_tpu.utils.testing import build_tiny_sam

        model, params = build_tiny_sam()
        plain = SamPredictor(model, params)

        from sam_pt_tpu.models.sam.sam_model import Sam

        mesh = create_tp_mesh(n_model=2, n_data=4)
        model_tp = Sam(
            encoder_variant="vit_tiny_test", image_size=64,
            tp_axis="model", dp_axis="data",
        )
        tp = SamPredictor(model_tp, params, mesh=mesh)

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(
            rng.uniform(0, 255, size=(8, 64, 64, 3)).astype(np.float32)
        )
        e1 = plain.encode_frames(imgs, (64, 64))
        e2 = tp.encode_frames(imgs, (64, 64))
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)

        pts = jnp.asarray(rng.uniform(0, 60, size=(8, 3, 2)).astype(np.float32))
        lbl = jnp.ones((8, 3), jnp.int32)
        m1, i1, _ = plain.predict(e1, pts, lbl, (64, 64))
        m2, i2, _ = tp.predict(e2, pts, lbl, (64, 64))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-5)


class TestPallasTpParity:
    """TP through the PALLAS fused kernels (VERDICT r3 #5): at real-SAM
    scale (grid >= 32, fused window + padded-head global kernels engaged)
    the shard_map head-sharded attention must reproduce the unsharded
    fused-kernel encode. Config: embed 256 / 8 heads -> native window head
    dim 32 (head-block unit hb=4, so model=2 gives 4 aligned local heads),
    global head dim padded to 128."""

    CFG = dict(
        img_size=512, patch_size=16, embed_dim=256, depth=2, num_heads=8,
        out_chans=32, window_size=14, global_attn_indexes=(1,),
    )

    def test_pallas_tp_matches_unsharded_fused(self):
        enc = ImageEncoderViT(**self.CFG)
        rng = np.random.default_rng(0)
        shapes = jax.eval_shape(
            lambda: enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))
        )
        leaves, td = jax.tree_util.tree_flatten(shapes)
        params = jax.tree_util.tree_unflatten(
            td,
            [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.05)
             for l in leaves],
        )
        x = jnp.asarray(rng.standard_normal((2, 512, 512, 3)).astype(np.float32))
        ref = np.asarray(jax.jit(enc.apply)(params, x))

        mesh = create_tp_mesh(n_model=2, n_data=2)
        enc_tp = ImageEncoderViT(tp_axis="model", dp_axis="data", **self.CFG)
        params_tp = shard_params_tp(params, mesh, axis="model")
        x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
        with jax.set_mesh(mesh):
            out = np.asarray(jax.jit(enc_tp.apply)(params_tp, x_sh))
        np.testing.assert_allclose(out, ref, atol=2e-5)
