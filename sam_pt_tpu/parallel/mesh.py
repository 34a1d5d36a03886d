"""Device-mesh helpers: the TPU-native scale-out surface.

The reference parallelizes only via detectron2 `launch()` multi-process eval
sharding (SURVEY.md §2.10); here scale-out is SPMD: a `jax.sharding.Mesh`
over all chips, batch axes sharded over a 'data' axis, parameters
replicated. SAM-PT's workload is embarrassingly parallel over (video, frame,
object) — batch-axis sharding puts every chip to work with zero collectives
on the forward path; XLA inserts any needed all-gathers at the boundaries.

ICI topology note: a single 'data' axis maps onto the physical ICI mesh in
device order; nothing here assumes DCN vs ICI — for multi-host runs, use
eval_sharding (video-level DCN parallelism) on top of per-host meshes.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Mesh over (a prefix of) local devices; default 1-D 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names=axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading batch axis across `axis`."""
    return NamedSharding(mesh, P(axis))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (parameters) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place array(s) with the leading axis sharded across `axis`.

    The leading axis must be divisible by the mesh size; callers pad/chunk
    to a multiple of the mesh size before sharding (no implicit padding
    here, so shapes stay static under jit).
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), x)
