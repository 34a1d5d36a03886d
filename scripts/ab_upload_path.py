"""Same-process A/B of the video upload path in the PIPELINED bench loop.

The r5 single-`device_put` upload rewrite measured fast in isolation
(diag_upload: whole 1711 MB/s vs chunk4 174 MB/s) but the pipelined bench
collapsed 17 s -> 37-57 s/pass right after it landed — which could equally
be the tunnel's hour-scale slow mode. This runs the full bench schedule
alternating upload modes within ONE process, so tunnel state is shared and
the comparison is honest.

Usage: python scripts/ab_upload_path.py [--passes 3]
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
    args = ap.parse_args()

    import bench
    from sam_pt_tpu.models.sam_pt import SamPt
    from sam_pt_tpu.vos_eval.eval import device_fuse_index_masks

    note("build")
    sam_pt = bench.build_pipeline()
    note("transfer warmup")
    np.asarray(jnp.zeros((8, 8)) + 1)

    videos = [bench.make_video(t, m, 480, 854, seed=i)
              for i, (t, m) in enumerate(bench.SCHEDULE)]
    total_frames = sum(t for t, _ in bench.SCHEDULE)

    chunked_upload = {"on": False}
    orig_upload_video = SamPt._upload_video

    def upload_video(self, images):
        if not chunked_upload["on"]:
            return orig_upload_video(self, images)
        # pre-r5 behavior: per-chunk host->device transfers
        ec = self.sam_encode_chunk
        return jnp.concatenate(
            [jnp.asarray(images[i:i + ec])
             for i in range(0, images.shape[0], ec)], axis=0)

    SamPt._upload_video = upload_video

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

    for mode in ("whole", "chunked", "whole", "chunked"):
        chunked_upload["on"] = mode == "chunked"
        note(f"warm {mode}")
        one_pass()
        ts = []
        for i in range(args.passes):
            ts.append(one_pass())
            note(f"{mode} pass {i + 1}: {ts[-1]:.2f}s "
                 f"({total_frames / ts[-1]:.2f} fps)")
        print(json.dumps({"mode": mode,
                          "pass_times_s": [round(t, 2) for t in ts],
                          "fps_best": round(total_frames / min(ts), 2)}),
              flush=True)


if __name__ == "__main__":
    main()
