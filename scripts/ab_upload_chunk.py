"""Same-process A/B of the upload GRANULARITY in the pipelined bench loop.

Each host->device transfer call pays a ~28 ms fixed cost on the tunnel
(diag_upload), so fewer/bigger uploads should win — but a whole-video
blocking transfer stalls compute dispatch (ab_upload_path). This sweeps
`SamPt.upload_chunk` (frames per transfer; encode stays at 4-frame
programs over device slices) across the full bench schedule in one
process, interleaved A/B/A/B so tunnel drift averages out.

Usage: python scripts/ab_upload_chunk.py [--passes 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

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
    ap.add_argument("--chunks", type=int, nargs="+", default=[4, 12, 24])
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

    def one_pass():
        t0 = time.perf_counter()
        pending = None
        for v in videos:
            nxt = dispatch_once(v)
            if pending is not None:
                pending.get()
            pending = nxt
        pending.get()
        return time.perf_counter() - t0

    results = {uc: [] for uc in args.chunks}
    for uc in args.chunks:  # warm each mode once
        sam_pt.upload_chunk = uc
        note(f"warm uc={uc}")
        one_pass()
    for rnd in range(args.passes):
        for uc in args.chunks:
            sam_pt.upload_chunk = uc
            dt = one_pass()
            results[uc].append(dt)
            note(f"round {rnd + 1} uc={uc}: {dt:.2f}s "
                 f"({total_frames / dt:.2f} fps)")
    for uc, ts in results.items():
        print(json.dumps({
            "upload_chunk": uc,
            "pass_times_s": [round(t, 2) for t in ts],
            "fps_best": round(total_frames / min(ts), 2),
            "fps_median": round(
                total_frames / sorted(ts)[len(ts) // 2], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
