"""Stage-by-stage warm of the bench pipeline with wall-clock heartbeats.

The driver bench (bench.py) warms each (frames, masks) schedule shape with
one pipelined `forward` call, which compiles EVERY stage program of that
shape in one opaque blocking call — when the remote compile service stalls
(observed: 10+ min for one program), there is no way to tell WHICH program
it was. This probe runs the identical device-flow stages one at a time,
printing a heartbeat before and after each, so a hang has a name. Compiled
programs land in the persistent cache either way, so probing also
fast-forwards later bench runs.

Usage: python scripts/warm_probe.py [--frames 70] [--masks 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.perf_counter()


def note(msg):
    print(f"[probe +{time.perf_counter() - _T0:5.0f}s] {msg}", flush=True)


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=70)
    ap.add_argument("--masks", type=int, default=3)
    args = ap.parse_args()

    import bench

    note("build_pipeline")
    sam_pt = bench.build_pipeline()
    note("build_pipeline done")

    v = bench.make_video(args.frames, args.masks, 480, 854, seed=1)
    images = v["image"]
    h, w = images.shape[1], images.shape[2]
    masks = v["query_masks"]
    timesteps = v["query_point_timestep"]

    note("query points (host)")
    qp = sam_pt.extract_query_points(images, masks, timesteps)

    note("upload+encode (chunked)")
    images_dev, emb = sam_pt._upload_and_encode(images)
    jax.block_until_ready(emb)
    note("upload+encode done")

    note("tracker forward_device")
    traj, vis = sam_pt._track_points_device(images_dev, qp, (h, w))
    jax.block_until_ready((traj, vis))
    note("tracker done")

    note("decode chain (device)")
    sam_pt._keep_logits_device = True
    _, logits, spf = sam_pt._apply_sam_device((h, w), traj, vis, emb)
    jax.block_until_ready(logits)
    note("decode chain done")

    note("fusion")
    from sam_pt_tpu.vos_eval.eval import device_fuse_index_masks

    fused = device_fuse_index_masks(
        jnp.asarray(logits), masks, [0] * args.masks, defer=True
    )
    fused.get()
    note("fusion done")
    note("ALL STAGES WARM")


if __name__ == "__main__":
    main()
