"""Per-stage microbenchmark of the SAM-PT pipeline on the attached TPU.

Serializes the pipeline stages (block_until_ready between them) to
attribute wall-clock to: host query sampling, video upload, tracker, SAM
encode, decode chain + refinement, fusion + download. The end-to-end bench
(bench.py) stays the source of truth for the headline fps — overlapped
stages sum to less there. Run on an idle host: host-side stages (kmedoids,
upload) are meaningless under CPU contention.

Usage: python scripts/microbench.py [--frames 16] [--masks 3] [--reps 3]
Prints one JSON line per stage plus the serialized total.
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


def median_time(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--masks", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 854))
    args = ap.parse_args()

    import bench

    h, w = args.hw
    t, m = args.frames, args.masks
    sam_pt = bench.build_pipeline()
    from sam_pt_tpu.vos_eval.eval import device_fuse_index_masks

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(t, h, w, 3)).astype(np.uint8)
    masks = np.zeros((m, h, w), np.float32)
    for i in range(m):
        masks[i, 40 + 120 * i: 160 + 120 * i, 80:460] = 1
    timesteps = np.zeros((m,), np.float32)

    results = {}

    # --- stage: host query-point sampling (kmedoids + mixed negatives)
    def sample():
        return sam_pt.extract_query_points(images, masks, timesteps)

    qp = sample()  # warm caches
    results["query_sampling_host"] = median_time(sample, args.reps)

    # --- stage: video upload (uint8, blocking)
    def upload():
        dev = jnp.asarray(images)
        dev.block_until_ready()
        return dev

    images_dev = upload()
    results["video_upload"] = median_time(upload, args.reps)

    # --- stage: tracker (CoTracker fwd+bwd over mask batch)
    def track():
        traj, vis = sam_pt._track_points(images, qp, images_dev=images_dev)
        return traj, vis

    trajectories, visibilities = track()
    results["tracker"] = median_time(track, args.reps)

    # --- stage: SAM encode (all frames, chunked)
    def encode():
        emb = sam_pt._encode_all_frames(images_dev)
        jax.block_until_ready(emb)
        return emb

    emb = encode()
    results["sam_encode"] = median_time(encode, args.reps)

    # --- stage: decode chain + 12 refinements (device logits)
    sam_pt._keep_logits_device = True

    def decode():
        _, logits, _ = sam_pt._apply_sam(
            images, trajectories, visibilities,
            embeddings=emb, device_images=images_dev,
        )
        jax.block_until_ready(logits)
        return logits

    logits = decode()
    results["sam_decode_chain"] = median_time(decode, args.reps)

    # --- stage: fusion + uint8 download
    def fuse():
        idx = device_fuse_index_masks(logits, masks, [0] * m)
        return np.asarray(idx)

    fuse()
    results["fusion_download"] = median_time(fuse, args.reps)

    total = sum(results.values())
    for name, dt in results.items():
        print(json.dumps({"stage": name, "seconds": round(dt, 4),
                          "per_frame_ms": round(1000 * dt / t, 2)}))
    print(json.dumps({"stage": "serialized_total", "seconds": round(total, 4),
                      "fps_serialized": round(t / total, 2)}))


if __name__ == "__main__":
    main()
