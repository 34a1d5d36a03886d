"""Multi-host evaluation sharding (replaces detectron2 launch/comm).

The reference shards VIS eval across GPUs with detectron2 `launch()` +
`comm.gather` (sam_pt/vis_eval/eval.py:59-66, ytvis_eval.py:120-126). The
TPU-native equivalent: each host process takes a strided slice of the video
list (DCN-level data parallelism), runs its slice on its local chips, and
metrics/records are gathered to host 0 with jax.experimental.multihost_utils.
Single-process runs degrade to identity.
"""
from __future__ import annotations

import pickle
from typing import Any, List, Sequence

import jax
import numpy as np


def shard_videos_across_hosts(items: Sequence[Any]) -> List[Any]:
    """Strided slice of the work list for this host process."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return list(items)
    return list(items)[jax.process_index() :: n_proc]


def gather_host_results(records: List[Any]) -> List[Any]:
    """Gather per-host python records to every host (rank-0 use: just read).

    Serializes with pickle into a padded uint8 tensor and all-gathers via
    multihost_utils; single-process returns the input unchanged.
    """
    if jax.process_count() == 1:
        return list(records)

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(records), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64)
    ).ravel()
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)

    out: List[Any] = []
    for i, size in enumerate(sizes):
        out.extend(pickle.loads(gathered[i, : int(size)].tobytes()))
    return out
