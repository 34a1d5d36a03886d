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


from tiny_hf_sam import MEAN, STD, build_tiny_hf_and_flax


@pytest.fixture(scope="module")
def hf_and_flax():
    return build_tiny_hf_and_flax(seed=1)


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
