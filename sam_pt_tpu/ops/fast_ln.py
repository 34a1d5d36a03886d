"""LayerNorm with MXU-computed statistics (TPU hot-path replacement).

XLA lowers LayerNorm's mean/variance as cross-lane VPU reductions and fuses
them into the epilogue of whatever matmul produces the LN input. Traced on
the SAM ViT-H encoder, that fusion turns a peak-rate matmul into a ~2.5x
slower `convert_reduce_fusion` — the two LN stat passes per block cost ~30%
of total encode time (see ROOFLINE.json history, round 3).

The fix: compute the row sums with dot-products against a ones vector, so
the reduction runs as a tiny matmul on the MXU (contractions over the lane
dimension are what the MXU is built for) and the producer matmul keeps its
clean epilogue. Semantics match `flax.linen.LayerNorm` with its default
`use_fast_variance=True`: mean = E[x], var = E[x^2] - E[x]^2, f32 statistics,
normalize + affine, cast back to `dtype`. The only numerical difference is
summation order (MXU tree accumulation in f32 vs the VPU loop — noise at
~1e-7 relative in f32; far below bf16 rounding in bf16).

Param names/shapes ('scale', 'bias') are identical to flax LayerNorm, so
checkpoint converters and existing state dicts are unaffected.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def mxu_layernorm_stats(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, var) over the last axis, reduced on the MXU.

    f32 accumulation via `preferred_element_type`; the elementwise square
    runs in the input dtype (for bf16 inputs the per-element rounding is
    ~2^-9 relative and averages down ~sqrt(C) in the sum — orders of
    magnitude below the bf16 activation rounding the model already carries;
    f32 inputs square exactly).
    """
    c = x.shape[-1]
    # The rhs is [C, 8] (all-ones columns, column 0 consumed) rather than
    # the natural [C, 1]: XLA's algebraic simplifier rewrites a dot with a
    # degenerate output dim back into the multiply+reduce it was meant to
    # replace, which re-fuses the cross-lane reduction into the producing
    # matmul's epilogue (the exact pathology this module exists to avoid).
    ones = jnp.ones((c, 8), x.dtype)
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    s1 = jax.lax.dot_general(
        x, ones, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[..., :1]  # [..., 1]
    s2 = jax.lax.dot_general(
        x * x, ones, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[..., :1]
    mean = s1 / c
    var = s2 / c - mean * mean
    return mean, var


def fast_gelu(x: jnp.ndarray, dtype: Any) -> jnp.ndarray:
    """GELU that is exact (erf) in f32 and tanh-approximate in bf16.

    The erf lowering costs ~1.0 ms per ViT-H MLP layer of pure VPU time on
    the encode trace (vs 0.16 ms for tanh); the tanh approximation's error
    (~3e-4 absolute at its worst, near |x|~2) sits below one bf16 ulp at
    unit scale (~4e-3), so on the bf16 path it is invisible next to the
    quantization the activations already carry. f32 paths (CPU parity
    tests against the torch reference) keep exact erf.

    RESERVED FOR THE ViT ENCODER MLP — the one site where the erf cost was
    measured to matter. Everything else (mask decoders, prompt encoder,
    TinyViT) uses `exact_gelu`: off the hot path the approximation buys
    nothing and silently widens the bf16 deviation envelope that f32
    parity tests cannot see (ADVICE r3).
    """
    return nn.gelu(x, approximate=(dtype == jnp.bfloat16))


def exact_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU in every dtype — matches the reference's
    torch.nn.GELU default. Use everywhere except the ViT encoder MLP."""
    return nn.gelu(x, approximate=False)


class FastLayerNorm(nn.Module):
    """Drop-in for `nn.LayerNorm(epsilon=..., dtype=...)` on TPU hot paths.

    Always applies scale and bias (the only configuration the SAM/tracker
    stacks use). Statistics are f32 regardless of `dtype`.
    """

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean, var = mxu_layernorm_stats(x)
        inv = jax.lax.rsqrt(var + jnp.float32(self.epsilon))
        y = (x.astype(jnp.float32) - mean) * inv
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)
