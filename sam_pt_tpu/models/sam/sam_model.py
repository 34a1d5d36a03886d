"""The composed SAM model (image encoder + prompt encoder + mask decoder).

Replaces the external `segment_anything.modeling.Sam` consumed by the reference
(SURVEY.md §2.9; normalization constants from configs/model/sam/sam_vit_base.yaml:
pixel_mean [123.675, 116.28, 103.53], pixel_std [58.395, 57.12, 57.375],
image_size 1024, embedding 64, mask_threshold 0.0).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .image_encoder import ImageEncoderViT, VIT_VARIANTS
from .prompt_encoder import PromptEncoder
from .mask_decoder import MaskDecoder

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


class Sam(nn.Module):
    """SAM: promptable segmentation. mask_threshold = 0.0 (logits > 0).

    use_hq swaps in the HQ-SAM mask decoder (MaskDecoderHQ), which consumes
    early encoder features; embeddings then flow as {'emb', 'interm'} dicts.
    """

    encoder_variant: str = "vit_b"
    image_size: int = 1024
    prompt_embed_dim: int = 256
    mask_in_chans: int = 16
    mask_threshold: float = 0.0
    pixel_mean: Tuple[float, float, float] = PIXEL_MEAN
    pixel_std: Tuple[float, float, float] = PIXEL_STD
    use_hq: bool = False
    hq_token_only: bool = False
    # OPT-IN pad-token cropping: run the encoder transformer only on token
    # rows/cols covering real image content (SAM pads inputs square, so a
    # 480p frame wastes ~44% of encoder compute on zero padding). DEVIATES
    # from the reference: pad tokens are absent as keys/values in the 4
    # global-attention layers and the decoder sees zeros off-image —
    # unvalidated against trained weights/J&F, so default OFF.
    crop_pad_tokens: bool = False
    # Tensor parallelism for the ViT image encoder (the FLOP king): mesh
    # axis name heads/MLP-hidden are sharded over. ViT variants only
    # (TinyViT stays data-parallel — it is already cheap). `dp_axis` names
    # the batch-sharded mesh axis when TP is combined with data parallelism
    # on a 2D mesh. See parallel/tensor_parallel.py.
    tp_axis: Optional[str] = None
    dp_axis: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        grid = self.image_size // 16
        if self.encoder_variant == "vit_t":  # MobileSAM TinyViT
            if self.tp_axis is not None:
                raise ValueError(
                    "tp_axis is only supported for ViT encoder variants "
                    "(vit_b/l/h), not TinyViT"
                )
            from .tiny_vit import TinyViT

            self.image_encoder = TinyViT(
                img_size=self.image_size,
                out_chans=self.prompt_embed_dim,
                dtype=self.dtype,
            )
        else:
            cfg = VIT_VARIANTS[self.encoder_variant]
            self.image_encoder = ImageEncoderViT(
                img_size=self.image_size,
                out_chans=self.prompt_embed_dim,
                tp_axis=self.tp_axis,
                dp_axis=self.dp_axis,
                dtype=self.dtype,
                **cfg,
            )
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim,
            image_embedding_size=(grid, grid),
            input_image_size=(self.image_size, self.image_size),
            mask_in_chans=self.mask_in_chans,
            dtype=self.dtype,
        )
        if self.use_hq:
            from .mask_decoder_hq import MaskDecoderHQ

            vit_dim = (
                320 if self.encoder_variant == "vit_t"
                else VIT_VARIANTS[self.encoder_variant]["embed_dim"]
            )
            self.mask_decoder = MaskDecoderHQ(
                transformer_dim=self.prompt_embed_dim,
                vit_dim=vit_dim,
                dtype=self.dtype,
            )
        else:
            self.mask_decoder = MaskDecoder(
                transformer_dim=self.prompt_embed_dim, dtype=self.dtype
            )

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] float RGB 0-255 (already longest-side resized) ->
        normalized + zero-padded [B, image_size, image_size, 3]."""
        mean = jnp.array(self.pixel_mean, dtype=jnp.float32)
        std = jnp.array(self.pixel_std, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, self.image_size - h), (0, self.image_size - w), (0, 0)))
        return x.astype(self.dtype)

    def encode_images(self, images: jnp.ndarray):
        """[B, h, w, 3] float 0-255 (longest side == image_size after resize)
        -> image embeddings [B, grid, grid, 256]; with use_hq, a dict
        {'emb': ..., 'interm': [B, grid, grid, vit_dim]}."""
        x = self.preprocess(images)
        # TinyViT (vit_t) has no valid_hw parameter — only pass the kwarg to
        # the ViT encoder, where pad-token cropping lives.
        enc_kwargs = {}
        if isinstance(self.image_encoder, ImageEncoderViT):
            valid_hw = None
            if self.crop_pad_tokens:
                ps = self.image_encoder.patch_size
                valid_hw = (
                    -(-images.shape[1] // ps), -(-images.shape[2] // ps)
                )
            enc_kwargs["valid_hw"] = valid_hw
        if self.use_hq:
            emb, interm = self.image_encoder(
                x, return_interm=True, **enc_kwargs
            )
            return {"emb": emb, "interm": interm}
        return self.image_encoder(x, **enc_kwargs)

    def decode_masks(
        self,
        image_embeddings: jnp.ndarray,  # [B, g, g, 256]
        points: jnp.ndarray,            # [B, N, 2] in model (1024) coords
        labels: jnp.ndarray,            # [B, N] int32
        mask_input: Optional[jnp.ndarray] = None,  # [B, 4g, 4g, 1] logits
        mask_valid: Optional[jnp.ndarray] = None,  # [B] bool
        only_token0: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched prompt->mask decoding.

        Returns (low_res_logits [B, T, 4g, 4g], iou_pred [B, T]) where
        T = 4 mask tokens; callers slice token 0 (single) or 1:4 (multi).
        `only_token0` (plain decoder only): emit mask logits for token 0
        alone — [B, 1, 4g, 4g], same values — for chain passes that never
        read tokens 1..3 (3/4 of the mask head is discarded work there).

        Pad handling: segment_anything appends exactly ONE not-a-point pad to
        the visible points — but only when no box is given
        (PromptEncoder._embed_points pad=(boxes is None)); the reference's
        box-refinement passes supply a box (sam_pt/modeling/sam_pt.py:821-828)
        and therefore run with NO pad token. Our fixed padded layout
        reproduces both cases by (a) appending one always-pad slot and
        (b) masking every pad slot out of the decoder's token attention
        except the first — and all of them for rows that carry box-corner
        labels (2/3). All pad slots share the identical not_a_point
        embedding, so which one stays active is immaterial.
        """
        b = points.shape[0]
        points = jnp.concatenate(
            [points, jnp.zeros((b, 1, 2), points.dtype)], axis=1
        )
        labels = jnp.concatenate(
            [labels, jnp.full((b, 1), -1, labels.dtype)], axis=1
        )
        is_pad = labels == -1
        first_pad = is_pad & (jnp.cumsum(is_pad.astype(jnp.int32), axis=1) == 1)
        has_box = (labels >= 2).any(axis=1)
        prompt_valid = ~is_pad | (first_pad & ~has_box[:, None])

        sparse, dense = self.prompt_encoder(points, labels, mask_input, mask_valid)
        image_pe = self.prompt_encoder.get_dense_pe()
        if self.use_hq:
            from .mask_decoder_hq import select_hq_masks

            emb = image_embeddings["emb"]
            interm = image_embeddings["interm"]
            masks, iou_pred = self.mask_decoder(
                emb.astype(self.dtype),
                image_pe.astype(self.dtype),
                sparse.astype(self.dtype),
                dense.astype(self.dtype),
                interm,
                prompt_valid,
            )
            masks = masks.astype(jnp.float32)
            iou_pred = iou_pred.astype(jnp.float32)
            # fold HQ selection into the same [B, 4, h, w] token layout the
            # callers expect: token 0 := single-mask HQ result, 1:4 := sam multi
            hq_single, hq_iou = select_hq_masks(
                masks, iou_pred, multimask_output=False,
                hq_token_only=self.hq_token_only,
            )
            masks_out = jnp.concatenate([hq_single, masks[:, 1:4]], axis=1)
            iou_out = jnp.concatenate([hq_iou, iou_pred[:, 1:4]], axis=1)
            return masks_out, iou_out
        masks, iou_pred = self.mask_decoder(
            image_embeddings.astype(self.dtype),
            image_pe.astype(self.dtype),
            sparse.astype(self.dtype),
            dense.astype(self.dtype),
            prompt_valid,
            only_token0=only_token0,
        )
        return masks.astype(jnp.float32), iou_pred.astype(jnp.float32)

    def __call__(self, images, points, labels):
        """Convenience end-to-end forward (used for init/shape-checking).

        Passes a dummy, disabled mask input so flax init traces the mask
        downscaling path too; mask_valid=False keeps no-mask semantics.
        """
        emb = self.encode_images(images)
        b = points.shape[0]
        g4 = 4 * (self.image_size // 16)
        dummy_mask = jnp.zeros((b, g4, g4, 1), jnp.float32)
        return self.decode_masks(
            emb, points, labels, dummy_mask, jnp.zeros((b,), bool)
        )


def build_sam(variant: str = "vit_b", dtype: Any = jnp.float32, **kw) -> Sam:
    return Sam(encoder_variant=variant, dtype=dtype, **kw)
