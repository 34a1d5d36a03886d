"""Diagnose the loaded-upload bandwidth collapse (VERDICT r3 #2).

ROOFLINE r3: host->device upload measures 1020 MB/s on an idle runtime but
34.9 MB/s once the bench pipeline is resident — a 30x collapse that caps the
pipeline at ~12 fps by itself once encode is fixed. This script isolates the
variables: allocator pressure (params resident), outstanding dispatched
work, transfer granularity, destination layout, and API (device_put vs
jnp.asarray).

Usage: python scripts/diag_upload.py [--reps 5]
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


def mbps(nbytes, dt):
    return round(nbytes / dt / 1e6, 1)


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    reps = args.reps

    dev = jax.devices()[0]
    video = np.random.default_rng(0).integers(
        0, 255, (70, 480, 854, 3)).astype(np.uint8)
    nb = video.nbytes

    def put_whole():
        jax.device_put(video, dev).block_until_ready()

    def put_chunked(ec):
        bufs = [jax.device_put(video[i:i + ec], dev)
                for i in range(0, 70, ec)]
        for b in bufs:
            b.block_until_ready()

    results = {}

    def report(name, dt, nbytes=nb):
        results[name] = mbps(nbytes, dt)
        print(json.dumps({"probe": name, "mbps": results[name],
                          "s": round(dt, 3)}))

    # 1. idle baseline (nothing else resident)
    put_whole()
    report("idle_whole", median_time(put_whole, reps))
    report("idle_chunk8", median_time(lambda: put_chunked(8), reps))

    # 2. params resident, no work dispatched yet
    import bench

    sam_pt = bench.build_pipeline()
    report("params_resident_whole", median_time(put_whole, reps))

    # 3. after one full forward (programs compiled + run, allocator churned)
    v = bench.make_video(35, 1, 480, 854, seed=0)
    out = sam_pt.forward(v)
    jax.block_until_ready(out["logits"])
    report("after_forward_whole", median_time(put_whole, reps))
    report("after_forward_chunk4", median_time(lambda: put_chunked(4), reps))
    report("after_forward_chunk8", median_time(lambda: put_chunked(8), reps))
    report("after_forward_chunk16", median_time(lambda: put_chunked(16), reps))

    # 4. jnp.asarray path (what the orchestrator calls)
    def asarray_whole():
        jnp.asarray(video).block_until_ready()

    asarray_whole()
    report("after_forward_asarray", median_time(asarray_whole, reps))

    # 5. smaller payloads: does the collapse scale with size or is it a
    # fixed stall?
    for frames in (1, 4, 16):
        sub = video[:frames]

        def put_sub(sub=sub):
            jax.device_put(sub, dev).block_until_ready()

        put_sub()
        report(f"after_forward_{frames}f", median_time(put_sub, reps),
               nbytes=sub.nbytes)

    # 6. during active compute: dispatch a long encode, upload while it runs
    images_dev = jnp.asarray(v["image"])
    emb = sam_pt._encode_all_frames(images_dev)  # dispatched, not fetched
    t0 = time.perf_counter()
    put_whole()
    report("during_encode_whole", time.perf_counter() - t0)
    jax.block_until_ready(emb)

    print(json.dumps({"probe": "summary", **results}))


if __name__ == "__main__":
    main()
