"""Batched SAM predictor for precomputed embeddings.

The reference's SamPredictor processes ONE image per `set_image` call and one
prompt set per `predict_torch` call, recomputing the ViT encoder per video
frame (sam_pt/modeling/sam_pt.py:849) — the dominant cost. This predictor
inverts that (SURVEY.md §7 'guiding inversions'):

  - `encode_frames` embeds a whole batch of frames in one jitted call;
  - `predict` decodes masks for a whole [batch] of (embedding, prompt-set)
    pairs in one jitted call, with padded fixed-size point arrays
    (label -1 = padding) instead of ragged per-frame visible-point lists;
  - prompt chaining (negative-point two-pass, sam_pt.py:791-807) and
    iterative box refinement (sam_pt.py:809-828) are expressed as further
    batched decoder calls / lax.fori_loop inside jit by the orchestrator.

Coordinates: callers work in ORIGINAL image pixel space; the predictor scales
them to model space (ResizeLongestSide.apply_coords semantics).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.resize import (
    get_longest_side_target_hw,
    resize_bilinear,
)
from .sam_model import Sam


class SamPredictor:
    """Stateless-by-design predictor: params are passed in, jits are cached.

    Pass a `jax.sharding.Mesh` to run data-parallel over chips: parameters
    are replicated, batch axes (frames for encode; (frame, object) pairs for
    decode) are sharded over the mesh's 'data' axis, and XLA partitions the
    programs — no collectives on this embarrassingly parallel path.
    """

    def __init__(self, model: Sam, params, *, antialias: bool = True,
                 mesh=None):
        self.model = model
        self.antialias = antialias
        self.mesh = mesh
        tp_axis = getattr(model, "tp_axis", None)
        if mesh is not None and tp_axis is not None:
            # Tensor-parallel encoder over the mesh's `tp_axis` (heads + MLP
            # hidden; see parallel/tensor_parallel.py), data-parallel over
            # the mesh's remaining 'data' axis if present. Encoder kernels
            # are contraction-sharded; everything else replicated.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ...parallel.tensor_parallel import shard_params_tp

            if tp_axis not in mesh.axis_names:
                raise ValueError(
                    f"model.tp_axis={tp_axis!r} not in mesh axes "
                    f"{mesh.axis_names}"
                )
            params = shard_params_tp(params, mesh, axis=tp_axis)
            dp = getattr(model, "dp_axis", None)
            data = NamedSharding(mesh, P(dp) if dp else P())
            self._data_sharding = data
            self._encode_jit = jax.jit(self._encode, in_shardings=(None, data),
                                       out_shardings=data,
                                       static_argnums=(2,))
            self._decode_jit = jax.jit(self._decode)
        elif mesh is not None:
            from ...parallel.mesh import batch_sharding, replicate

            params = replicate(params, mesh)
            data = batch_sharding(mesh)
            self._data_sharding = data
            self._encode_jit = jax.jit(self._encode, in_shardings=(None, data),
                                       out_shardings=data,
                                       static_argnums=(2,))
            self._decode_jit = jax.jit(self._decode)
        else:
            self._data_sharding = None
            self._encode_jit = jax.jit(self._encode, static_argnums=(2,))
            self._decode_jit = jax.jit(self._decode)
        self.params = params

    # ------------------------------------------------------------------
    # Encoding
    # ------------------------------------------------------------------
    def _encode(
        self, params, images: jnp.ndarray, target_hw: Tuple[int, int]
    ) -> jnp.ndarray:
        """Fused preprocess + encode: the longest-side resize runs INSIDE the
        jitted program. The out-of-jit version re-uploaded ~4.6 MB of f32
        resize weight matrices per chunk (`jnp.asarray` in ops/resize.py) and
        dispatched six unfused layout/einsum ops — measured 17.9 ms/frame
        standalone on the real chip, with its uploads contending against
        video chunks for the tunnel's collapsed loaded bandwidth. In-jit the
        matrices are compile-time constants and the ops fuse."""
        x = resize_bilinear(
            images.astype(jnp.float32), target_hw, antialias=self.antialias
        )
        return self.model.apply(params, x, method=Sam.encode_images)

    def encode_frames(
        self, images: jnp.ndarray, original_hw: Tuple[int, int]
    ) -> jnp.ndarray:
        """images: [B, H, W, 3] uint8/float RGB in original resolution.

        Returns image embeddings [B, g, g, 256]. The longest-side resize is a
        matmul-based op and runs on device as part of the jitted program.
        """
        target_hw = get_longest_side_target_hw(
            original_hw[0], original_hw[1], self.model.image_size
        )
        images = jnp.asarray(images)
        if self.mesh is not None and getattr(self.model, "tp_axis", None):
            # bare-P sharding constraints inside the encoder need a mesh
            # context at trace time
            with jax.set_mesh(self.mesh):
                return self._encode_jit(self.params, images, target_hw)
        return self._encode_jit(self.params, images, target_hw)

    # ------------------------------------------------------------------
    # Decoding
    # ------------------------------------------------------------------
    def scale_coords(
        self, coords: jnp.ndarray, original_hw: Tuple[int, int]
    ) -> jnp.ndarray:
        """Original-pixel (x, y) -> model-input (1024-space) coords."""
        th, tw = get_longest_side_target_hw(
            original_hw[0], original_hw[1], self.model.image_size
        )
        scale = jnp.array(
            [tw / original_hw[1], th / original_hw[0]], dtype=jnp.float32
        )
        return coords * scale

    def _decode(
        self,
        params,
        embeddings: jnp.ndarray,
        points: jnp.ndarray,
        labels: jnp.ndarray,
        mask_input: Optional[jnp.ndarray],
        mask_valid: Optional[jnp.ndarray],
        only_token0: bool = False,
    ):
        return self.model.apply(
            params,
            embeddings,
            points,
            labels,
            mask_input,
            mask_valid,
            only_token0=only_token0 and not self.model.use_hq,
            method=Sam.decode_masks,
        )

    def predict(
        self,
        embeddings: jnp.ndarray,  # [B, g, g, 256]
        points: jnp.ndarray,      # [B, N, 2] original-pixel coords
        labels: jnp.ndarray,      # [B, N] int32, -1 = pad
        original_hw: Tuple[int, int],
        mask_input: Optional[jnp.ndarray] = None,  # [B, 4g, 4g, 1]
        mask_valid: Optional[jnp.ndarray] = None,
        multimask_output: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Batched predict.

        Returns (low_res_logits [B, K, 4g, 4g], iou_pred [B, K], token_slice)
        with K = 3 if multimask else 1 (SAM output-token selection semantics).
        """
        pts = self.scale_coords(jnp.asarray(points, jnp.float32), original_hw)
        masks, iou = self._decode_jit(
            self.params, embeddings, pts, jnp.asarray(labels, jnp.int32),
            mask_input, mask_valid,
        )
        if multimask_output:
            return masks[:, 1:4], iou[:, 1:4], slice(1, 4)
        return masks[:, 0:1], iou[:, 0:1], slice(0, 1)

    # ------------------------------------------------------------------
    # Postprocess
    # ------------------------------------------------------------------
    def upscale_logits(
        self, low_res_logits: jnp.ndarray, original_hw: Tuple[int, int]
    ) -> jnp.ndarray:
        """[.., 4g, 4g] low-res logits -> [.., H, W] original-resolution logits.

        SAM postprocess_masks semantics: bilinear to model size, crop the
        padded region, bilinear to the original size.
        """
        th, tw = get_longest_side_target_hw(
            original_hw[0], original_hw[1], self.model.image_size
        )
        x = low_res_logits[..., None]  # channels-last for resize
        x = resize_bilinear(x, (self.model.image_size, self.model.image_size))
        x = x[..., :th, :tw, :]
        x = resize_bilinear(x, original_hw)
        return x[..., 0]
