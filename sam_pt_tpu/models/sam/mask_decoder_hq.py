"""HQ-SAM mask decoder: HQ output token + early-ViT-feature fusion.

Re-implements the `segment_anything_hq` MaskDecoderHQ the reference wraps
(SURVEY.md §2.9; vit_dim wiring per configs/model/sam/samhq_vit_huge.yaml:27).
On top of the standard SAM decoder: a 5th mask token (HQ), a compressed
high-resolution feature path built from the image embedding plus an early ViT
block output (`interm_embeddings`), and an HQ mask head operating on the
fused high-res features. Output selection follows sam-hq semantics:
  multimask: SAM token with best IoU (+ HQ delta) ; single: token 0 (+ HQ).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.fast_conv import ConvT2x2
from ...ops.fast_ln import exact_gelu

from .image_encoder import LayerNorm2d
from .mask_decoder import HyperMLP, TwoWayTransformer


class MaskDecoderHQ(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    vit_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,   # [B, H, W, C]
        image_pe: jnp.ndarray,           # [1, H, W, C]
        sparse_prompt: jnp.ndarray,      # [B, N, C]
        dense_prompt: jnp.ndarray,       # [B, H, W, C]
        interm_embeddings: jnp.ndarray,  # [B, H, W, vit_dim] early ViT feats
        prompt_valid=None,               # [B, N] bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (mask logits [B, 1 + num_multimask + 1, 4H, 4W], iou [B, ...]).

        Token layout: [sam_single, sam_multi x3, hq]. Callers combine per
        sam-hq semantics (see `select_hq_masks`).
        """
        c = self.transformer_dim
        num_mask_tokens = self.num_multimask_outputs + 2  # + HQ token

        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, c))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (self.num_multimask_outputs + 1, c),
        )
        hf_token = self.param("hf_token", nn.initializers.normal(1.0), (1, c))

        b = sparse_prompt.shape[0]
        output_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens, hf_token], axis=0)[None],
            (b, 1 + num_mask_tokens, c),
        ).astype(sparse_prompt.dtype)
        tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=1)
        token_valid = None
        if prompt_valid is not None:
            token_valid = jnp.concatenate(
                [jnp.ones((b, 1 + num_mask_tokens), bool), prompt_valid],
                axis=1,
            )

        # high-res HQ features: upscaled image embedding + compressed ViT feats
        def embedding_encoder(x):
            x = ConvT2x2(c // 4, name="embedding_encoder_conv1",
                         dtype=self.dtype)(x)
            x = LayerNorm2d(name="embedding_encoder_ln")(x)
            x = exact_gelu(x)
            return ConvT2x2(c // 8, name="embedding_encoder_conv2",
                            dtype=self.dtype)(x)

        def compress_vit_feat(x):
            x = ConvT2x2(c, name="compress_vit_conv1", dtype=self.dtype)(x)
            x = LayerNorm2d(name="compress_vit_ln")(x)
            x = exact_gelu(x)
            return ConvT2x2(c // 8, name="compress_vit_conv2",
                            dtype=self.dtype)(x)

        hq_features = embedding_encoder(image_embeddings.astype(self.dtype)) + \
            compress_vit_feat(interm_embeddings.astype(self.dtype))

        src = image_embeddings + dense_prompt
        hs, src_out = TwoWayTransformer(
            embed_dim=c, name="transformer", dtype=self.dtype
        )(src, image_pe, tokens, token_valid)

        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens, :]

        h, w = image_embeddings.shape[1], image_embeddings.shape[2]
        src_img = src_out.reshape(b, h, w, c)
        x = ConvT2x2(c // 4, name="upscale_conv1", dtype=self.dtype)(src_img)
        x = LayerNorm2d(name="upscale_ln")(x)
        x = exact_gelu(x)
        x = ConvT2x2(c // 8, name="upscale_conv2", dtype=self.dtype)(x)
        upscaled_sam = exact_gelu(x)  # [B, 4H, 4W, C/8]

        def embedding_maskfeature(x):
            x = nn.Conv(c // 4, (3, 3), padding=1,
                        name="maskfeature_conv1", dtype=self.dtype)(x)
            x = LayerNorm2d(name="maskfeature_ln")(x)
            x = exact_gelu(x)
            return nn.Conv(c // 8, (3, 3), padding=1,
                           name="maskfeature_conv2", dtype=self.dtype)(x)

        upscaled_hq = embedding_maskfeature(upscaled_sam) + hq_features

        hyper_in = []
        for i in range(num_mask_tokens):
            name = (
                f"output_hypernetworks_mlps_{i}"
                if i < self.num_multimask_outputs + 1
                else "hf_mlp"
            )
            hyper_in.append(
                HyperMLP(c, c // 8, name=name, dtype=self.dtype)(
                    mask_tokens_out[:, i, :]
                )
            )
        hyper_in = jnp.stack(hyper_in, axis=1)  # [B, T, C/8]

        masks_sam = jnp.einsum(
            "btc,bhwc->bthw",
            hyper_in[:, : self.num_multimask_outputs + 1],
            upscaled_sam,
        )
        masks_hq = jnp.einsum(
            "btc,bhwc->bthw",
            hyper_in[:, self.num_multimask_outputs + 1 :],
            upscaled_hq,
        )
        masks = jnp.concatenate([masks_sam, masks_hq], axis=1)

        iou_pred = HyperMLP(
            self.iou_head_hidden_dim,
            self.num_multimask_outputs + 1,
            num_layers=self.iou_head_depth,
            name="iou_prediction_head",
            dtype=self.dtype,
        )(iou_token_out)

        return masks, iou_pred


def select_hq_masks(
    masks: jnp.ndarray,
    iou_pred: jnp.ndarray,
    multimask_output: bool,
    hq_token_only: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """sam-hq output selection.

    masks: [B, 5, h, w] (tokens [sam0, multi1..3, hq]); iou_pred: [B, 4].
    multimask: pick the best of tokens 1..3 by predicted IoU, add the HQ mask
    unless hq_token_only. Returns ([B, 1, h, w], [B, 1]).
    """
    if multimask_output:
        iou_multi = iou_pred[:, 1:4]
        best = jnp.argmax(iou_multi, axis=1)  # [B]
        sam_mask = jnp.take_along_axis(
            masks[:, 1:4], best[:, None, None, None], axis=1
        )
        iou_out = jnp.take_along_axis(iou_multi, best[:, None], axis=1)
    else:
        sam_mask = masks[:, 0:1]
        iou_out = iou_pred[:, 0:1]
    hq = masks[:, 4:5]
    out = hq if hq_token_only else sam_mask + hq
    return out, iou_out
