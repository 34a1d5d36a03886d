"""Shared tiny torch-SAM <-> flax-SAM pair for parity tests.

Builds a small `transformers.SamModel` (a faithful torch SAM whose state
dict maps 1:1 onto the original segment_anything checkpoint layout) with
fixed random weights, plus the matching flax `Sam` and converted params.
Used by the SAM full-model parity tests and the end-to-end orchestrator
parity tests (reference sam_pt/modeling/sam_pt.py consumed SAM through the
external package, SURVEY.md §2.9).
"""
import numpy as np
import torch

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)

IMAGE_SIZE = 64  # tiny model: patch 16 -> grid 4, low-res masks 16x16


def build_tiny_hf_and_flax(seed: int = 1, crop_pad_tokens: bool = False):
    """Returns (hf SamModel, flax Sam, converted flax params)."""
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
        image_size=IMAGE_SIZE, patch_size=16, window_size=2,
        global_attn_indexes=[1, 3], output_channels=32, num_pos_feats=16,
    )
    pc = SamPromptEncoderConfig(hidden_size=32, image_size=IMAGE_SIZE,
                                patch_size=16, mask_input_channels=4)
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
    g = torch.Generator().manual_seed(seed)
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
    model = Sam(encoder_variant="hf_parity_test", image_size=IMAGE_SIZE,
                prompt_embed_dim=32, mask_in_chans=4,
                crop_pad_tokens=crop_pad_tokens)
    return hf, model, params
