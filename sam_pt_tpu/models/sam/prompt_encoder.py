"""SAM prompt encoder, batched + padding-friendly.

Replaces the external `segment_anything` PromptEncoder the reference wraps
(SURVEY.md §2.9; mask_in_chans=16 per configs/model/sam/prompt_encoder/sam.yaml).

TPU-first contract: prompts arrive as FIXED-SHAPE padded arrays —
  points [B, N, 2] float (x, y) in input-image pixel space,
  labels [B, N] int32 with SAM semantics:
      1 = positive point, 0 = negative point,
      2 = box top-left corner, 3 = box bottom-right corner,
     -1 = padding (contributes the not-a-point embedding).
Variable-length prompt sets (the reference's per-frame visible-point filtering,
sam_pt/modeling/sam_pt.py:734-735) become label masking — no ragged shapes, so
one jitted decoder program serves every (frame, mask) pair in a batch.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.fast_conv import Conv2x2Down
from ...ops.fast_ln import exact_gelu

from .image_encoder import LayerNorm2d


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (matern of the SAM paper)."""

    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords01: jnp.ndarray) -> jnp.ndarray:
        """coords01: [..., 2] normalized to [0, 1]. Returns [..., 2*num_pos_feats]."""
        gauss = self.param(
            "gaussian_matrix",
            lambda key, shape: self.scale * jax.random.normal(key, shape),
            (2, self.num_pos_feats),
        )
        c = 2.0 * coords01 - 1.0
        c = (2.0 * jnp.pi) * (c @ gauss.astype(coords01.dtype))
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(num_pos_feats=self.embed_dim // 2)
        # 4 prompt-type embeddings: [neg point, pos point, box TL, box BR]
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0), (self.embed_dim,))
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.mask_conv1 = Conv2x2Down(self.mask_in_chans // 4,
                                      name="mask_conv1", dtype=self.dtype)
        self.mask_ln1 = LayerNorm2d(name="mask_ln1")
        self.mask_conv2 = Conv2x2Down(self.mask_in_chans,
                                      name="mask_conv2", dtype=self.dtype)
        self.mask_ln2 = LayerNorm2d(name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), name="mask_conv3",
                                  dtype=self.dtype)

    def get_dense_pe(self) -> jnp.ndarray:
        """Positional encoding of the image-embedding grid: [1, H, W, C]."""
        h, w = self.image_embedding_size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [h, w, 2]
        return self.pe_layer(grid)[None]

    def encode_points(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """points [B, N, 2] (x, y) pixels, labels [B, N] -> sparse [B, N, C].

        Matches SAM: +0.5 pixel-center shift, normalize by input_image_size,
        then add the per-type learned embedding; padding (-1) replaces the PE
        with not_a_point_embed.
        """
        coords = (points + 0.5) / jnp.array(
            [self.input_image_size[1], self.input_image_size[0]],
            dtype=points.dtype,
        )
        pe = self.pe_layer(coords)  # [B, N, C]

        type_table = jnp.stack(
            [
                self.not_a_point_embed,  # label -1 -> index 0
                self.point_embeddings[0],  # label 0 (negative)
                self.point_embeddings[1],  # label 1 (positive)
                self.point_embeddings[2],  # label 2 (box TL)
                self.point_embeddings[3],  # label 3 (box BR)
            ],
            axis=0,
        ).astype(pe.dtype)  # [5, C]
        type_onehot = jax.nn.one_hot(labels + 1, 5, dtype=pe.dtype)  # [B, N, 5]
        type_embed = type_onehot @ type_table

        is_pad = (labels == -1)[..., None]
        pe = jnp.where(is_pad, 0.0, pe)
        return pe + type_embed

    def encode_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """boxes [B, 4] (x1, y1, x2, y2) -> [B, 2, C] corner embeddings."""
        corners = boxes.reshape(-1, 2, 2)
        labels = jnp.broadcast_to(
            jnp.array([2, 3], dtype=jnp.int32), corners.shape[:2]
        )
        return self.encode_points(corners, labels)

    def encode_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """masks [B, 4*H, 4*W, 1] logits -> dense embedding [B, H, W, C]."""
        x = self.mask_conv1(masks)
        x = self.mask_ln1(x)
        x = exact_gelu(x)
        x = self.mask_conv2(x)
        x = self.mask_ln2(x)
        x = exact_gelu(x)
        return self.mask_conv3(x)

    def no_mask_dense(self, batch: int) -> jnp.ndarray:
        h, w = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1), (batch, h, w, self.embed_dim)
        )

    def __call__(
        self,
        points: Optional[jnp.ndarray],
        labels: Optional[jnp.ndarray],
        masks: Optional[jnp.ndarray] = None,
        mask_valid: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sparse [B, N, C], dense [B, H, W, C]).

        mask_valid: optional [B] bool — rows where False use the no-mask
        embedding even though a (padded) mask array was passed. This keeps the
        "mask_input or not" choice inside one jitted program (the reference
        branches in python, sam_pt/modeling/sam_pt.py:782-807).
        """
        assert (points is None) == (labels is None)
        if points is not None:
            sparse = self.encode_points(points, labels)
            batch = points.shape[0]
        else:
            raise ValueError("points/labels are required (pad + label=-1 for none)")

        if masks is None:
            dense = self.no_mask_dense(batch)
        else:
            dense = self.encode_masks(masks)
            if mask_valid is not None:
                dense = jnp.where(
                    mask_valid[:, None, None, None],
                    dense,
                    self.no_mask_dense(batch).astype(dense.dtype),
                )
        return sparse, dense
