"""Ring-style TEMPORAL sharding of tracker cost volumes across a mesh.

The reference handles long videos only by host-side temporal chunking
(SURVEY.md §5 long-context: PIPS windows, PIPS++ sliding carry, reinit
horizons) — a single GPU sees every frame. On a TPU slice, the natural
scale-out for "one long video" is to shard the FRAME axis across devices:

  - the TSM-ResNet backbone + cost volume + per-frame heads of TapNet are
    frame-local except the Temporal Shift Module's 1-frame coupling, which
    becomes a ring halo exchange (`lax.ppermute` over ICI) — see
    `models/tracker/tapnet/model.py::temporal_shift`;
  - query features are sampled on the shard that owns the query frame and
    combined with a masked `psum`;
  - outputs stay frame-sharded until the caller gathers them.

The sharded program is numerically IDENTICAL to the unsharded model (same
ops, same boundaries — validated to ~1e-5 in tests/test_parallel.py), so
temporal sharding composes with checkpoint parity: it is a deployment
knob, not a model variant.

Reference anchor: the dormant `cross_replica_axis='i'` pmap hook in the
reference's TapNet batchnorm (tapnet_model.py:189-212) is the only
collective the reference ever declares; this module is its TPU-native
generalization to real sequence parallelism.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


# jit cache for the sharded programs: jax.jit caches on function identity,
# so the jitted shard_map must be built once per (model config, mesh, axis,
# padded length, outputs) and reused — rebuilding it per chunk would run the
# shard_map EAGERLY (op-by-op dispatch) or retrace every call.
_JITTED: Dict[tuple, "jax.stages.Wrapped"] = {}


def _forward_time_sharded(
    model,
    params,
    video: jnp.ndarray,
    query_points: jnp.ndarray,
    mesh: Mesh,
    axis: str,
    out_keys: tuple,
) -> Dict[str, jnp.ndarray]:
    """Shared scaffold: ceil-pad frames to the mesh, clone the model with
    `time_axis=axis`, run one JITTED shard_map, crop the pad frames."""
    n_dev = mesh.shape[axis]
    t = video.shape[0]
    t_pad = -(-t // n_dev) * n_dev
    if t_pad != t:
        video = jnp.pad(
            video, ((0, t_pad - t), (0, 0), (0, 0), (0, 0))
        )
    key = (model, mesh, axis, out_keys, t)
    jitted = _JITTED.get(key)
    if jitted is None:
        sharded_model = model.clone(time_axis=axis)

        def fn(p, v_local, qp):
            out = sharded_model.apply(p, v_local, qp, t_valid=t)
            return tuple(out[k] for k in out_keys)

        jitted = jax.jit(shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=tuple(P(None, axis) for _ in out_keys),
            check_vma=False,
        ))
        _JITTED[key] = jitted
    # Explicit mesh placement: inputs may arrive COMMITTED to a single
    # device (e.g. outputs of an unsharded jit like the trackers' fused
    # resize+normalize programs), which jit(shard_map) over the mesh
    # rejects instead of resharding. device_put makes the placement ours.
    from jax.sharding import NamedSharding

    params = jax.device_put(params, NamedSharding(mesh, P()))
    video = jax.device_put(video, NamedSharding(mesh, P(axis)))
    query_points = jax.device_put(query_points, NamedSharding(mesh, P()))
    outs = jitted(params, video, query_points)
    return {k: v[:, :t] for k, v in zip(out_keys, outs)}


def tapnet_forward_time_sharded(
    model,
    params,
    video: jnp.ndarray,
    query_points: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> Dict[str, jnp.ndarray]:
    """Run a TAPNet forward with frames sharded over `mesh[axis]`.

    model: an (unsharded) `TAPNet` instance — it is cloned with
    `time_axis=axis` so the parameter tree is reused as-is.
    video: [T, H, W, 3] global array; query_points: [N, 3] (t, y, x).
    Returns dict(tracks [N, T, 2], occlusion [N, T]) gathered on the host
    program's global view (frames past T are padded internally and cropped).
    """
    return _forward_time_sharded(
        model, params, video, query_points, mesh, axis,
        ("tracks", "occlusion"),
    )


def tapir_forward_time_sharded(
    model,
    params,
    video: jnp.ndarray,
    query_points: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> Dict[str, jnp.ndarray]:
    """Run a TAPIR forward with frames sharded over `mesh[axis]`.

    Same pattern as `tapnet_forward_time_sharded`; TAPIR's extra temporal
    coupling — the PIPs mixer's kernel-3 depthwise time convs (2 per block,
    12 blocks, `num_pips_iter` iterations) — becomes ring halo exchanges
    (`_halo_time_pad` in the model), so outputs match the unsharded model.
    video: [T, 256, 256, 3] in [-1, 1]; query_points: [N, 3] (t, y, x).
    """
    return _forward_time_sharded(
        model, params, video, query_points, mesh, axis,
        ("tracks", "occlusion", "expected_dist"),
    )
