"""Same-process A/B of cross-video pipeline depth in the bench loop.

Depth 1 (today): video i's mask download resolves right after video i+1 is
dispatched — its wire time races video i+1's uploads. Depth 2: downloads
resolve two videos behind, giving the tunnel a full video of compute
between a video's uploads and the previous downloads. Semantics unchanged
(downloads are exact either way); only contention shifts.

Usage: python scripts/ab_pipeline_depth.py [--passes 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.perf_counter()


def note(msg):
    print(f"[ab +{time.perf_counter() - _T0:5.0f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import bench
    from sam_pt_tpu.vos_eval.eval import device_fuse_index_masks

    note("build")
    sam_pt = bench.build_pipeline()
    note("transfer warmup")
    np.asarray(jnp.zeros((8, 8)) + 1)

    videos = [bench.make_video(t, m, 480, 854, seed=i)
              for i, (t, m) in enumerate(bench.SCHEDULE)]
    total_frames = sum(t for t, _ in bench.SCHEDULE)

    def dispatch_once(video):
        out = sam_pt.forward(video)
        n_masks = video["query_masks"].shape[0]
        return device_fuse_index_masks(
            out["logits"], video["query_masks"], [0] * n_masks, defer=True)

    def one_pass(depth):
        t0 = time.perf_counter()
        pending = deque()
        for v in videos:
            pending.append(dispatch_once(v))
            if len(pending) > depth:
                pending.popleft().get()
        while pending:
            pending.popleft().get()
        return time.perf_counter() - t0

    for depth in (1, 2):
        note(f"warm depth={depth}")
        one_pass(depth)
    results = {1: [], 2: []}
    for rnd in range(args.passes):
        for depth in (1, 2):
            dt = one_pass(depth)
            results[depth].append(dt)
            note(f"round {rnd + 1} depth={depth}: {dt:.2f}s "
                 f"({total_frames / dt:.2f} fps)")
    for depth, ts in results.items():
        print(json.dumps({
            "depth": depth,
            "pass_times_s": [round(t, 2) for t in ts],
            "fps_best": round(total_frames / min(ts), 2),
            "fps_median": round(total_frames / sorted(ts)[len(ts) // 2], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
