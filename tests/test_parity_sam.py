"""Full-model SAM numerical parity vs an importable torch reference.

The original `segment_anything` package is not installed in this
environment, but `transformers` ships a faithful torch SAM (`SamModel`,
transformers/models/sam/modeling_sam.py) whose state dict maps 1:1 onto the
original checkpoint layout. `hf_sam_to_sam_state_dict` bridges the naming,
so these tests validate the ENTIRE flax SAM stack (ViT-det encoder with
windowed + global rel-pos attention, prompt encoder, TwoWay mask decoder,
multimask/single-mask token selection and IoU head) against real torch
outputs with shared random weights — retiring the transcribed-micro-
reference-only status of SAM parity (reference consumed the stack via the
external package, SURVEY.md §2.9).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def hf_and_flax():
    import jax.numpy as jnp
    from transformers import SamConfig, SamModel
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    from sam_pt_tpu.utils.checkpoint import (
        convert_sam_state_dict,
        hf_sam_to_sam_state_dict,
    )

    vc = SamVisionConfig(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=2,
        image_size=64, patch_size=16, window_size=2,
        global_attn_indexes=[1, 3], output_channels=32, num_pos_feats=16,
    )
    pc = SamPromptEncoderConfig(hidden_size=32, image_size=64, patch_size=16,
                                mask_input_channels=4)
    # mlp_dim / iou_head_hidden_dim pinned to the original SAM constants the
    # flax modules use (segment_anything defaults 2048 / 256)
    mc = SamMaskDecoderConfig(hidden_size=32, num_attention_heads=2,
                              mlp_dim=2048, iou_head_hidden_dim=256)
    cfg = SamConfig(
        vision_config=vc.to_dict(),
        prompt_encoder_config=pc.to_dict(),
        mask_decoder_config=mc.to_dict(),
    )
    hf = SamModel(cfg).eval()
    sd = hf.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.08
    # HF keeps two copies of the positional gaussian matrix (image-wide +
    # prompt); the original model has one — tie them
    sd["shared_image_embedding.positional_embedding"] = sd[
        "prompt_encoder.shared_embedding.positional_embedding"
    ]
    hf.load_state_dict(sd)

    params = convert_sam_state_dict(hf_sam_to_sam_state_dict(sd))

    import sam_pt_tpu.models.sam.image_encoder as _ie
    from sam_pt_tpu.models.sam.sam_model import Sam

    _ie.VIT_VARIANTS.setdefault("hf_parity_test", dict(
        embed_dim=64, depth=4, num_heads=2, global_attn_indexes=(1, 3),
        window_size=2,
    ))
    model = Sam(encoder_variant="hf_parity_test", image_size=64,
                prompt_embed_dim=32, mask_in_chans=4)
    return hf, model, params


MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


class TestSamFullModelParity:
    def test_image_encoder(self, hf_and_flax, rng):
        import jax.numpy as jnp

        from sam_pt_tpu.models.sam.sam_model import Sam

        hf, model, params = hf_and_flax
        img = rng.uniform(0, 255, size=(1, 64, 64, 3)).astype(np.float32)
        px = ((img - MEAN) / STD).transpose(0, 3, 1, 2)
        with torch.no_grad():
            ref = hf.vision_encoder(
                torch.from_numpy(px)).last_hidden_state.numpy()
        got = np.asarray(
            model.apply(params, jnp.asarray(img), method=Sam.encode_images)
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=5e-3)

    def test_mask_decode_multimask_and_single(self, hf_and_flax, rng):
        import jax.numpy as jnp

        from sam_pt_tpu.models.sam.sam_model import Sam

        hf, model, params = hf_and_flax
        img = rng.uniform(0, 255, size=(1, 64, 64, 3)).astype(np.float32)
        px = ((img - MEAN) / STD).transpose(0, 3, 1, 2)
        pts = np.array([[[10.0, 20.0], [40.0, 33.0], [5.0, 60.0]]],
                       np.float32)
        lbl = np.array([[1, 1, 0]], np.int64)

        with torch.no_grad():
            multi = hf(pixel_values=torch.from_numpy(px),
                       input_points=torch.from_numpy(pts[:, None]),
                       input_labels=torch.from_numpy(lbl[:, None]),
                       multimask_output=True)
            single = hf(pixel_values=torch.from_numpy(px),
                        input_points=torch.from_numpy(pts[:, None]),
                        input_labels=torch.from_numpy(lbl[:, None]),
                        multimask_output=False)

        emb = model.apply(params, jnp.asarray(img), method=Sam.encode_images)
        masks, iou = model.apply(
            params, emb, jnp.asarray(pts), jnp.asarray(lbl.astype(np.int32)),
            method=Sam.decode_masks,
        )
        masks = np.asarray(masks)
        iou = np.asarray(iou)

        np.testing.assert_allclose(
            masks[0, 1:4], multi.pred_masks.numpy()[0, 0], atol=2e-3)
        np.testing.assert_allclose(
            iou[0, 1:4], multi.iou_scores.numpy()[0, 0], atol=2e-3)
        np.testing.assert_allclose(
            masks[0, 0:1], single.pred_masks.numpy()[0, 0], atol=2e-3)

    def test_box_and_mask_input_decode(self, hf_and_flax, rng):
        """Box + mask-input prompt parity — the exact surface of the
        reference's box-refinement pass (sam_pt/modeling/sam_pt.py:809-828):
        points + a box + a low-res mask input, single-mask output.

        Pins two composed semantics that the points-only tests can't see:
        (a) segment_anything appends its not-a-point pad ONLY when no box is
        given (PromptEncoder._embed_points pad=(boxes is None)) — our
        decode_masks must drop the pad token for rows with corner labels;
        (b) box corners are encoded as labels 2/3 next to the points.
        """
        import jax.numpy as jnp

        from sam_pt_tpu.models.sam.sam_model import Sam

        hf, model, params = hf_and_flax
        img = rng.uniform(0, 255, size=(1, 64, 64, 3)).astype(np.float32)
        px = ((img - MEAN) / STD).transpose(0, 3, 1, 2)
        pts = np.array([[[10.0, 20.0], [40.0, 33.0]]], np.float32)
        lbl = np.array([[1, 0]], np.int64)
        box = np.array([[8.0, 12.0, 50.0, 60.0]], np.float32)
        g4 = 4 * (64 // 16)
        mask_in = rng.normal(size=(1, g4, g4)).astype(np.float32) * 3.0

        with torch.no_grad():
            ref = hf(
                pixel_values=torch.from_numpy(px),
                input_points=torch.from_numpy(pts[:, None]),
                input_labels=torch.from_numpy(lbl[:, None]),
                input_boxes=torch.from_numpy(box[:, None]),
                input_masks=torch.from_numpy(mask_in[:, None]),
                multimask_output=False,
            )

        emb = model.apply(params, jnp.asarray(img), method=Sam.encode_images)
        pts_aug = np.concatenate(
            [pts, box.reshape(1, 2, 2)], axis=1
        )
        lbl_aug = np.concatenate(
            [lbl, np.array([[2, 3]], np.int64)], axis=1
        )
        masks, iou = model.apply(
            params, emb, jnp.asarray(pts_aug),
            jnp.asarray(lbl_aug.astype(np.int32)),
            jnp.asarray(mask_in[..., None]), jnp.ones((1,), bool),
            method=Sam.decode_masks,
        )
        np.testing.assert_allclose(
            np.asarray(masks)[0, 0:1], ref.pred_masks.numpy()[0, 0],
            atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(iou)[0, 0:1], ref.iou_scores.numpy()[0, 0], atol=2e-3)
