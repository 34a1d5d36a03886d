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
ViT-L/H, 12 for ViT-B), and TP routes through the XLA attention path — the
Pallas fused kernels are single-device programs GSPMD cannot partition.
Combine with a `data` axis for a 2D (data x model) mesh: frames shard over
`data`, heads/MLP over `model`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
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
        if tail == ("qkv", "kernel") or tail == ("proj", "kernel"):
            return P(axis, None)
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
