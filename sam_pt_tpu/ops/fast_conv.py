"""Matmul-lowered 2x2/stride-2 (de)convolutions for the SAM decode path.

XLA's TPU lowering of `conv_general_dilated` for tiny-kernel strided convs
runs far below matmul efficiency (measured on the decode trace: the mask
decoder's two ConvTranspose(2,2,s2) layers cost 5.1 ms per 48-element chunk
vs 0.84 ms for the identical math as a matmul + depth-to-space — the same
effect that made the encoder's patch embed 7x faster as a matmul,
models/sam/image_encoder.py::PatchEmbed). With stride == kernel size the
windows never overlap, so both directions are EXACT block reshapes around a
single matmul:

  ConvT2x2:   y[b, 2i+dy, 2j+dx, o] = sum_c x[b, i, j, c] k[dy, dx, c, o]
  Conv2x2Down: y[b, i, j, o] = sum_{dy,dx,c} x[b, 2i+dy, 2j+dx, c] k[dy,dx,c,o]

Param trees (names "kernel"/"bias", flax layouts (kh, kw, in, out)/(out,),
lecun_normal init) are IDENTICAL to the nn.ConvTranspose / nn.Conv modules
they replace, so checkpoint converters and parity tests are untouched.

Used by the SAM mask decoder upscale head (reference semantics:
segment_anything MaskDecoder.output_upscaling) and the prompt encoder's
mask-input downscaling (PromptEncoder.mask_downscaling) — both on the
per-refinement-pass hot path (12 box-refinement passes per decode chain,
reference sam_pt/modeling/sam_pt.py:809-828).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class ConvT2x2(nn.Module):
    """Exact nn.ConvTranspose(features, (2, 2), strides=(2, 2)) replacement."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)  # match nn.ConvTranspose(dtype=...) promotion
        # [2, 2, C, O] -> [C, 2*2*O] so one matmul emits all four sub-pixels.
        # lax.conv_transpose (transpose_kernel=False, flax default) applies
        # the kernel spatially FLIPPED: out[2i+dy, 2j+dx] uses k[1-dy, 1-dx]
        # (verified against nn.ConvTranspose in tests/test_fast_conv.py).
        wmat = jnp.transpose(
            kernel[::-1, ::-1].astype(self.dtype), (2, 0, 1, 3)
        ).reshape(c, 4 * self.features)
        y = (x.reshape(b * h * w, c) @ wmat).reshape(b, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, self.features)
        return y + bias.astype(self.dtype)


class Conv2x2Down(nn.Module):
    """Exact nn.Conv(features, (2, 2), strides=(2, 2)) replacement."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, (
            f"Conv2x2Down requires even H/W (got {h}x{w}): the block "
            "reshape cannot express nn.Conv's SAME padding of odd inputs"
        )
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        # space-to-depth in (dy, dx, c) order to match kernel.reshape below
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * (h // 2) * (w // 2), 4 * c)
        wmat = kernel.astype(self.dtype).reshape(4 * c, self.features)
        y = (x @ wmat).reshape(b, h // 2, w // 2, self.features)
        return y + bias.astype(self.dtype)
