"""Tensor (model) parallelism for the SAM ViT image encoder.

The reference has no model parallelism of any kind (SURVEY.md §2.10: the only
scale-out is detectron2 multi-process eval sharding). Data parallelism
already covers VOS/VIS throughput — the workload is embarrassingly parallel
over (video, frame, object) — but it cannot touch single-image latency, and
the interactive path (SamPtInteractive, reference
sam_pt/modeling/sam_pt_interactive.py:113-131) encodes ONE frame on the
user-facing critical path. Sharding the encoder itself over a `model` mesh
axis is the TPU-native answer: ICI-riding collectives, no host involvement.

Layout (per ViT block, m = size of the model axis):

  - `qkv.kernel [C, 3*H*Dp]` — sharded on the CONTRACTION dim `P(axis,
    None)`. Each device holds a row slice, computes a partial projection of
    the full output, and XLA inserts one psum. The projection output is then
    replicated, so the head-sharding constraint inside `Attention`
    (image_encoder.py) is a free local slice. Column-sharding would be
    cheaper in FLOPs-per-collective, but the checkpoint's column order is
    [3, H, Dp] with q/k/v interleaved at the MAJOR position — a flat column
    shard crosses the q/k/v boundary and GSPMD cannot express the resulting
    pattern through the head-split reshape (it would insert a full
    all-gather of the qkv activation instead). Contraction sharding keeps
    every collective a clean psum.
  - per-head attention math — head-sharded via the constraint; logits,
    rel-pos bias einsums, softmax and prob@v all run on H/m heads/device.
  - `proj.kernel [H*Dp, C]` — `P(axis, None)`: the contraction dim is
    head-major, so the incoming head-sharded activation lines up with the
    kernel's row shard; partial matmul + psum (the Megatron row-parallel
    output projection).
  - `mlp_lin1.kernel [C, 4C]` — `P(None, axis)` column shard (+ bias
    `P(axis)`): the GELU runs on the sharded hidden dim.
  - `mlp_lin2.kernel [4C, C]` — `P(axis, None)` row shard; partial + psum.
  - LayerNorms, rel-pos tables (shared across heads), patch embed, neck,
    pos_embed — replicated.

Net: 3 psums per block (qkv out, attn out, mlp out) — one more than
textbook Megatron because of the interleaved qkv column order; the extra
psum buys fully-distributed qkv compute without a weight-layout fork
between the TP and single-chip checkpoints.

Constraints: the model-axis size must divide batch*num_heads (16 heads for
ViT-L/H, 12 for ViT-B). Combine with a `data` axis for a 2D (data x model)
mesh: frames shard over `data`, heads/MLP over `model`.

Attention under TP runs the PALLAS fused kernels per shard via
`tp_shardmap_attention` (GSPMD cannot partition a custom call, but inside
`jax.shard_map` every device runs a single-device program — the kernels are
per-head grid-parallel, so head sharding composes naturally): each device
projects qkv for its OWN head slice (1/m of the qkv FLOPs, against a
replicated kernel it slices locally), runs the fused window/global kernel on
local heads, and contributes a row-parallel output projection closed by ONE
f32 psum — one collective per attention sublayer instead of the two the
GSPMD path paid. Falls back to the XLA-attention GSPMD path when the local
head count misaligns with the kernels' lane-tiling constraints (see
`ImageEncoderViT` for the conditions).
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sam_tp_param_specs(params, axis: str = "model"):
    """PartitionSpec pytree for a Sam (or bare ImageEncoderViT) param tree.

    ViT encoder block kernels get the Megatron-style specs documented in the
    module docstring; every other parameter (prompt encoder, mask decoder,
    norms, rel-pos tables, patch embed, neck) is replicated.
    """

    def spec_for(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if not any(str(n).startswith("blocks_") for n in names):
            return P()
        tail = tuple(str(n) for n in names[-2:])
        # qkv/proj kernels stay REPLICATED: the shard_map attention slices
        # its own head block locally (free on a replicated array), which is
        # what lets each device run 1/m of the qkv projection AND the Pallas
        # kernel with a single closing psum. (They were contraction-sharded
        # when attention went through GSPMD — that layout forced a full
        # [B, N, 3*H*Dp] activation psum per block.)
        if tail == ("mlp_lin1", "kernel"):
            return P(None, axis)
        if tail == ("mlp_lin1", "bias"):
            return P(axis)
        if tail == ("mlp_lin2", "kernel"):
            return P(axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """Place a Sam param tree on `mesh` with encoder kernels TP-sharded."""
    specs = sam_tp_param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )


def tp_shardmap_attention(
    x: "jnp.ndarray",
    qkv_kernel: "jnp.ndarray",
    qkv_bias: "jnp.ndarray",
    proj_kernel: "jnp.ndarray",
    proj_bias: "jnp.ndarray",
    rel_h: "jnp.ndarray",
    rel_w: "jnp.ndarray",
    *,
    heads: int,
    tp_size: int,
    scale: float,
    axis: str,
    dp_axis: Optional[str],
    kh: int,
    kw: int,
    dtype: Any,
):
    """Head-sharded rel-pos attention sublayer (qkv Dense -> Pallas fused
    kernel -> output projection) under `jax.shard_map`.

    x: [B, N, C] token-flat input (windows batched into B for windowed
    blocks); kh*kw == N. qkv_kernel: [C, 3*H*Dp] in the converted column
    order [3, H, Dp]; proj_kernel: [H*Dp, C] head-major rows. rel_h/rel_w:
    resolved [kh|kw, kh|kw, Dp] tables (shared across heads — replicated).

    Each device slices its OWN head block of the replicated qkv kernel
    (columns are independent, so the local projection output is exactly the
    corresponding slice of the full projection), runs the fused kernel on
    `heads/tp_size` local heads, and computes a row-parallel partial output
    projection in f32, closed by one psum. Requires an active mesh whose
    `axis` has size `tp_size` (jax.set_mesh at trace time).

    Numerics vs unsharded: identical up to the f32-psum summation order of
    the output projection (the single-device matmul accumulates the full
    contraction in one f32 tree; here m partial f32 trees are psum'ed).
    """
    b, n, c = x.shape
    assert kh * kw == n, (kh, kw, n)
    assert heads % tp_size == 0, (heads, tp_size)
    hl = heads // tp_size
    hdp = qkv_kernel.shape[-1] // (3 * heads)

    from ..ops.flash_attention import (
        fused_qkv_relpos_attention,
        fused_qkv_window_attention,
    )

    windowed = n < 1024

    wq = qkv_kernel.reshape(c, 3, heads, hdp)
    bq = qkv_bias.reshape(3, heads, hdp)
    wp = proj_kernel.reshape(heads, hdp, c)
    xspec = P(dp_axis, None, None) if dp_axis else P(None, None, None)

    def body(xl, wql, bql, wpl, rh, rw):
        wq2 = wql.reshape(c, 3 * hl * hdp).astype(dtype)
        bq2 = bql.reshape(3 * hl * hdp).astype(dtype)
        qkv = xl @ wq2 + bq2  # [B_local, N, 3*hl*hdp]
        if windowed:
            out = fused_qkv_window_attention(
                qkv, rh, rw, scale=scale, heads=hl
            )
        else:
            out = fused_qkv_relpos_attention(
                qkv, rh, rw, scale=scale, kh=kh, kw=kw, heads=hl
            )
        wp2 = wpl.reshape(hl * hdp, c).astype(dtype)
        part = jax.lax.dot_general(
            out, wp2, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.psum(part, axis)

    out = jax.shard_map(
        body,
        # pallas_call inside a shard_map body cannot declare how its output
        # varies over mesh axes (vma), so the automatic replication check
        # must be off; the closing psum is what makes out_specs sound.
        check_vma=False,
        in_specs=(
            xspec,
            P(None, None, axis, None),  # qkv kernel: head blocks
            P(None, axis, None),        # qkv bias
            P(axis, None, None),        # proj kernel: head-major rows
            P(), P(),                   # rel tables replicated
        ),
        out_specs=xspec,
    )(x, wq, bq, wp, rel_h.astype(dtype), rel_w.astype(dtype))
    return (out + proj_bias.astype(jnp.float32)).astype(dtype)


def create_tp_mesh(
    n_model: int,
    n_data: Optional[int] = None,
    devices=None,
    axis_names=("data", "model"),
) -> Mesh:
    """2D (data x model) mesh over (a prefix of) local devices.

    The model axis is the FASTER-varying (minor) axis so its collectives ride
    adjacent-device ICI links; data-parallel replicas stack on the major axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data or '?'}x{n_model} (data x model) needs "
            f"{max(n_model, (n_data or 0) * n_model)} devices, but only "
            f"{len(devices)} are available"
        )
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=axis_names)
