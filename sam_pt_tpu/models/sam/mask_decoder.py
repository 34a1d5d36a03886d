"""SAM mask decoder: TwoWayTransformer + hypernetwork mask heads.

Replaces the external `segment_anything` MaskDecoder/TwoWayTransformer the
reference wraps (SURVEY.md §2.9: depth 2, mlp 2048, attention downsample 2).
Fully batched: one jitted call decodes masks for a whole batch of
(image-embedding, prompt-set) pairs — this is what lets the orchestrator run
SAM for all (frame, object) pairs at once instead of the reference's
per-frame-per-mask python loop (sam_pt/modeling/sam_pt.py:848-858).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.fast_conv import ConvT2x2
from ...ops.fast_ln import exact_gelu

from .image_encoder import LayerNorm2d


class DownsampledAttention(nn.Module):
    """MHA with an internally downsampled channel dim (SAM decoder style)."""

    embed_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, kv_valid=None):
        internal = self.embed_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        qp = nn.Dense(internal, name="q_proj", dtype=self.dtype)(q)
        kp = nn.Dense(internal, name="k_proj", dtype=self.dtype)(k)
        vp = nn.Dense(internal, name="v_proj", dtype=self.dtype)(v)

        if q.shape[1] >= 1024 or k.shape[1] >= 1024:
            # Image-side cross-attention (the decoder's hot path): the XLA
            # composition materializes [B, H, Nq, Nk] probabilities in HBM
            # (~290 MB f32 at the decode-chain chunk shape, ~0.97 ms per
            # attention, 5 per pass x up to 14 passes) — the fused kernel
            # keeps logits/probs in VMEM with bit-mirrored numerics
            # (ops/flash_attention.py::fused_cross_attention).
            from ...ops.flash_attention import fused_cross_attention

            out = fused_cross_attention(
                qp, kp, vp, heads=self.num_heads,
                divisor=head_dim ** 0.5, kv_valid=kv_valid,
            )
            return nn.Dense(self.embed_dim, name="out_proj",
                            dtype=self.dtype)(out)

        def split(x):
            b, n, _ = x.shape
            return jnp.transpose(
                x.reshape(b, n, self.num_heads, head_dim), (0, 2, 1, 3)
            )

        qh, kh, vh = split(qp), split(kp), split(vp)
        logits = (qh @ jnp.swapaxes(kh, -1, -2)) / (head_dim ** 0.5)
        if kv_valid is not None:
            # mask padded prompt slots out of the softmax so the fixed-shape
            # batched layout is numerically identical to the reference's
            # visible-points-plus-one-pad prompts
            logits = jnp.where(kv_valid[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = attn @ vh
        b, h, n, d = out.shape
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)
        return nn.Dense(self.embed_dim, name="out_proj", dtype=self.dtype)(out)


class MLPBlock(nn.Module):
    mlp_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, name="lin1", dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, name="lin2", dtype=self.dtype)(x)


class TwoWayAttentionBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe, token_valid=None):
        # 1. Self-attention on the tokens (invalid pad slots masked as keys).
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(
                self.embed_dim, self.num_heads, 1, name="self_attn",
                dtype=self.dtype)(queries, queries, queries, token_valid)
        else:
            q = queries + query_pe
            attn_out = DownsampledAttention(
                self.embed_dim, self.num_heads, 1, name="self_attn",
                dtype=self.dtype)(q, q, queries, token_valid)
            queries = queries + attn_out
        queries = nn.LayerNorm(name="norm1", dtype=self.dtype)(queries)

        # 2. Cross-attention: tokens attend to the image.
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embed_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_token_to_image", dtype=self.dtype)(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(name="norm2", dtype=self.dtype)(queries)

        # 3. MLP on tokens.
        queries = queries + MLPBlock(self.mlp_dim, self.embed_dim, name="mlp",
                                     dtype=self.dtype)(queries)
        queries = nn.LayerNorm(name="norm3", dtype=self.dtype)(queries)

        # 4. Cross-attention: image attends to the tokens (pad slots masked).
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embed_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_image_to_token", dtype=self.dtype)(
                k, q, queries, token_valid)
        keys = keys + attn_out
        keys = nn.LayerNorm(name="norm4", dtype=self.dtype)(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding,
                 token_valid=None):
        """image_embedding/image_pe: [B, H, W, C]; point_embedding: [B, T, C];
        token_valid: [B, T] bool or None (True = token participates as a key)."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(-1, h * w, c), keys.shape)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                name=f"layers_{i}",
                dtype=self.dtype,
            )(queries, keys, point_embedding, key_pe, token_valid)

        q = queries + point_embedding
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embed_dim, self.num_heads, self.attention_downsample_rate,
            name="final_attn_token_to_image", dtype=self.dtype)(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(name="norm_final_attn", dtype=self.dtype)(queries)
        return queries, keys


class HyperMLP(nn.Module):
    """3-layer MLP used for the per-mask-token hypernetworks and IoU head."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    sigmoid_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layers_{i}",
                                 dtype=self.dtype)(x))
        x = nn.Dense(self.out_dim, name=f"layers_{self.num_layers - 1}",
                     dtype=self.dtype)(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,  # [B, H, W, C]
        image_pe: jnp.ndarray,          # [1, H, W, C]
        sparse_prompt: jnp.ndarray,     # [B, N, C]
        dense_prompt: jnp.ndarray,      # [B, H, W, C]
        prompt_valid: Optional[jnp.ndarray] = None,  # [B, N] bool
        only_token0: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (mask logits [B, num_tokens, 4H, 4W], iou_pred [B, num_tokens]).

        num_tokens = 1 + num_multimask_outputs; callers select token 0 for
        single-mask output or tokens 1..3 for multimask (SAM semantics).
        With `only_token0`, the mask logits carry token 0 alone ([B, 1, ...];
        identical values) while iou_pred stays full — the decode chain's
        passes never read tokens 1..3.
        """
        c = self.transformer_dim
        num_mask_tokens = self.num_multimask_outputs + 1

        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, c))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (num_mask_tokens, c)
        )
        b = sparse_prompt.shape[0]
        output_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None],
            (b, 1 + num_mask_tokens, c),
        ).astype(sparse_prompt.dtype)
        tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=1)
        token_valid = None
        if prompt_valid is not None:
            token_valid = jnp.concatenate(
                [
                    jnp.ones((b, 1 + num_mask_tokens), bool),
                    prompt_valid,
                ],
                axis=1,
            )

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
        upscaled = exact_gelu(x)  # [B, 4H, 4W, C/8]

        # Hypernetwork heads. `only_token0` (the decode-chain fast path):
        # every chain pass consumes masks[:, 0] / iou[:, 0] alone, and the
        # per-token hypernetworks are independent — computing tokens 1..3
        # there is pure discarded work (3/4 of the mask einsum + its
        # [B, T, 4H, 4W] materialization). Semantics of token 0 and of the
        # full iou head are unchanged.
        n_tok = 1 if only_token0 else num_mask_tokens
        hyper_in = jnp.stack(
            [
                HyperMLP(c, c // 8, name=f"output_hypernetworks_mlps_{i}",
                         dtype=self.dtype)(mask_tokens_out[:, i, :])
                for i in range(num_mask_tokens)
            ][:n_tok],
            axis=1,
        )  # [B, n_tok, C/8]

        masks = jnp.einsum(
            "btc,bhwc->bthw", hyper_in, upscaled
        )  # [B, n_tok, 4H, 4W]

        iou_pred = HyperMLP(
            self.iou_head_hidden_dim,
            num_mask_tokens,
            num_layers=self.iou_head_depth,
            name="iou_prediction_head",
            dtype=self.dtype,
        )(iou_token_out)

        return masks, iou_pred
