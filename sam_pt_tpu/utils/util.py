"""Shared utilities: visibility taxonomy, seeding, batching helpers.

PointVisibilityType mirrors the reference taxonomy exactly
(sam_pt/utils/util.py:267-282) so downstream visualization/eval semantics match:
a point is treated as visible iff its visibility value == 1.
"""
from __future__ import annotations

import enum
import random
from typing import Iterable, List, Sequence, TypeVar

import numpy as np

T = TypeVar("T")


class PointVisibilityType(enum.IntEnum):
    VISIBLE = 1
    INVISIBLE = 0
    REINIT_FAILED = -1
    OUTSIDE_FRAME = -2
    PATCH_NON_SIMILAR = -3
    REJECTED_AFTER_PATCH_WAS_NON_SIMILAR = -4


# Color coding used for trajectory visualization, one color per visibility type
# (mirrors reference sam_pt/utils/util.py:285-292).
VISIBILITY_TO_COLOR = {
    PointVisibilityType.VISIBLE: (0, 255, 0),
    PointVisibilityType.INVISIBLE: (255, 0, 0),
    PointVisibilityType.REINIT_FAILED: (0, 0, 0),
    PointVisibilityType.OUTSIDE_FRAME: (255, 255, 0),
    PointVisibilityType.PATCH_NON_SIMILAR: (255, 0, 255),
    PointVisibilityType.REJECTED_AFTER_PATCH_WAS_NON_SIMILAR: (0, 255, 255),
}


def seed_all(seed: int) -> None:
    """Seed python/numpy RNGs (reference sam_pt/utils/util.py:215 `seed_all`).

    JAX randomness is explicitly keyed and does not need global seeding; torch
    is seeded only if available (used by checkpoint-conversion tooling).
    """
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass


def batchify_list(data: Sequence[T], batch_size: int) -> List[List[T]]:
    """Split a list into chunks of at most batch_size (reference util.py:113)."""
    return [list(data[i : i + batch_size]) for i in range(0, len(data), batch_size)]


def round_up(x: int, multiple: int) -> int:
    """Round x up to the nearest multiple (TPU tile-alignment helper)."""
    return ((x + multiple - 1) // multiple) * multiple


def jitted_init(module, key, *args, **kwargs):
    """Run a flax/haiku `init` as ONE compiled program.

    Eager `module.init(...)` dispatches every parameter-creation op
    individually; on a remote-attached accelerator that is thousands of
    round trips (PIPS random init measured 4-7 MINUTES through the dev
    tunnel). Jitting the whole init makes it one (persistently cached)
    program. `args`/`kwargs` are closed over, so static options like
    `method=` or `iters=` pass through unchanged.
    """
    import jax

    return jax.jit(lambda k: module.init(k, *args, **kwargs))(key)


def apply_platform_override(platform) -> None:
    """Force a jax platform (the `platform:` root-config key, e.g. 'cpu').

    Environments can pin a default platform (sitecustomize setting
    JAX_PLATFORMS before our code runs), so env vars alone are not enough —
    the jax.config flip must happen in-process, BEFORE the first device op.
    No-op when `platform` is falsy."""
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", str(platform))
