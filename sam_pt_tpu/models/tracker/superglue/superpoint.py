"""SuperPoint keypoint detector + descriptor, TPU-native.

Re-implements the reference's vendored SuperPoint
(sam_pt/point_tracker/superglue/models/superpoint.py): VGG-style shared
encoder, 65-way cell softmax detector head (dustbin dropped), descriptor head
with bilinear sampling + L2 norm.

TPU-first: keypoint selection runs fully on device with FIXED shapes — NMS as
a max-pool equality test, border suppression, and a top-K over the whole
score map (K = max_keypoints) with a validity mask instead of ragged arrays.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ....ops.sampling import bilinear_sample


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Keep local maxima within a (2r+1)^2 window (magicleap simple_nms)."""
    window = 2 * radius + 1
    pooled = nn.max_pool(
        scores[None, :, :, None], (window, window), strides=(1, 1),
        padding="SAME",
    )[0, :, :, 0]
    return jnp.where(scores == pooled, scores, 0.0)


class SuperPoint(nn.Module):
    descriptor_dim: int = 256
    nms_radius: int = 4
    keypoint_threshold: float = 0.005
    remove_borders: int = 4
    max_keypoints: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        """image [H, W] grayscale in [0, 1].

        Returns dict(keypoints [K, 2] (x, y), scores [K], valid [K] bool,
        descriptors [K, D]); padded to K = max_keypoints.
        """
        h, w = image.shape
        x = image[None, :, :, None].astype(self.dtype)

        def vgg_block(x, ch, name):
            return nn.relu(
                nn.Conv(ch, (3, 3), padding="SAME", name=name,
                        dtype=self.dtype)(x)
            )

        x = vgg_block(x, 64, "conv1a")
        x = vgg_block(x, 64, "conv1b")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = vgg_block(x, 64, "conv2a")
        x = vgg_block(x, 64, "conv2b")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = vgg_block(x, 128, "conv3a")
        x = vgg_block(x, 128, "conv3b")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = vgg_block(x, 128, "conv4a")
        x = vgg_block(x, 128, "conv4b")

        # detector head
        cpa = vgg_block(x, 256, "convPa")
        logits = nn.Conv(65, (1, 1), name="convPb", dtype=self.dtype)(cpa)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :64]
        h8, w8 = probs.shape[1], probs.shape[2]
        heat = probs.reshape(h8, w8, 8, 8)
        heat = heat.transpose(0, 2, 1, 3).reshape(h8 * 8, w8 * 8)
        heat = heat[:h, :w]

        heat = simple_nms(heat, self.nms_radius)
        b = self.remove_borders
        border = jnp.zeros_like(heat)
        border = border.at[b : h - b, b : w - b].set(1.0)
        heat = heat * border
        heat = jnp.where(heat >= self.keypoint_threshold, heat, 0.0)

        k = self.max_keypoints
        flat = heat.reshape(-1)
        scores, idx = jax.lax.top_k(flat, k)
        ys = (idx // w).astype(jnp.float32)
        xs = (idx % w).astype(jnp.float32)
        keypoints = jnp.stack([xs, ys], axis=-1)  # [K, 2] (x, y)
        valid = scores > 0.0

        # descriptor head
        cda = vgg_block(x, 256, "convDa")
        desc_map = nn.Conv(self.descriptor_dim, (1, 1), name="convDb",
                           dtype=self.dtype)(cda)[0]  # [h8, w8, D]
        desc_map = desc_map / jnp.maximum(
            jnp.linalg.norm(desc_map, axis=-1, keepdims=True), 1e-12
        )
        # sample at keypoints: magicleap sample_descriptors maps pixel coords
        # with a half-cell offset then an align_corners=True normalization
        # over the PADDED extent (superpoint.py:84-93): grid cell
        #   g = (k - s/2 + 0.5) * (n8 - 1) / (n8*s - s/2 - 0.5)
        s = 8.0
        gx = (keypoints[:, 0] - s / 2 + 0.5) * (w8 - 1) / (w8 * s - s / 2 - 0.5)
        gy = (keypoints[:, 1] - s / 2 + 0.5) * (h8 - 1) / (h8 * s - s / 2 - 0.5)
        desc = bilinear_sample(desc_map, gx, gy, pad_mode="clamp")
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )

        return {
            "keypoints": keypoints,
            "scores": jnp.where(valid, scores, 0.0),
            "valid": valid,
            "descriptors": desc.astype(jnp.float32),
        }
