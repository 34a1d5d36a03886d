"""Encode-path experiments for the round-5 MFU attack (VERDICT r4 #2).

Block-level attribution (scripts/profile_encoder.py, r5 run) puts encode at
54.6 ms/frame vs a 29.1 ms floor with the excess split ~9.5 ms/frame window
blocks, ~5.2 ms/frame global blocks, ~6 ms/frame "remainder" (preprocess
resize + patch embed + neck + layouts). This script measures the remaining
composition levers END-TO-END through the real predictor path:

  a. chunk scaling: encode_frames serialized over 72 frames at chunk 4/8/12
     (fixed per-program costs amortize with B; VMEM/HBM pressure pushes back)
  b. resize outside vs inside the jitted program (today: resize_bilinear +
     f32 astype dispatch separately per chunk, predictor.py:103-107)
  c. the resize itself and the post-resize encode, separately

Usage: python scripts/probe_encode_shapes.py [--reps 3]
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
    print(f"[probe +{time.perf_counter() - _T0:5.0f}s] {msg}",
          file=sys.stderr, flush=True)


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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=72)
    args = ap.parse_args()
    reps = args.reps

    from bench import random_params
    from sam_pt_tpu.models.sam.predictor import SamPredictor
    from sam_pt_tpu.models.sam.sam_model import Sam
    from sam_pt_tpu.ops.resize import (
        get_longest_side_target_hw,
        resize_bilinear,
    )

    model = Sam(encoder_variant="vit_h", dtype=jnp.bfloat16)
    note("param init")
    params = random_params(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 540, 1024, 3)),
            jnp.zeros((1, 2, 2)),
            jnp.zeros((1, 2), jnp.int32),
        )
    )
    predictor = SamPredictor(model, params)
    note("transfer warmup")
    np.asarray(jnp.zeros((8, 8)) + 1)

    h, w = 480, 854
    t = args.frames
    video = np.random.default_rng(0).integers(0, 255, (t, h, w, 3)).astype(
        np.uint8)
    video_dev = jnp.asarray(video)
    video_dev.block_until_ready()
    th, tw = get_longest_side_target_hw(h, w, model.image_size)

    results = {}

    def report(name, s_total, frames=t):
        rec = {"probe": name, "s": round(s_total, 4),
               "ms_per_frame": round(1000 * s_total / frames, 2)}
        results[name] = rec
        print(json.dumps(rec), flush=True)

    # a. chunk scaling through today's encode_frames path
    for ec in (4, 8, 12):
        if t % ec:
            continue

        def run(ec=ec):
            embs = []
            for i in range(0, t, ec):
                embs.append(
                    predictor.encode_frames(video_dev[i:i + ec], (h, w)))
            jax.block_until_ready(embs)

        note(f"warm chunk {ec}")
        run()
        note(f"timing chunk {ec}")
        report(f"encode_frames_chunk{ec}", median_time(run, reps))

    # c. resize alone / post-resize encode alone, chunk 4
    def resize_only(ec=4):
        outs = []
        for i in range(0, t, ec):
            outs.append(resize_bilinear(
                video_dev[i:i + ec].astype(jnp.float32), (th, tw),
                antialias=predictor.antialias))
        jax.block_until_ready(outs)

    note("warm resize_only")
    resize_only()
    report("resize_only_chunk4", median_time(resize_only, reps))

    resized4 = resize_bilinear(
        video_dev[:4].astype(jnp.float32), (th, tw),
        antialias=predictor.antialias)
    resized4.block_until_ready()

    def encode_pre_resized(ec=4):
        outs = []
        for _ in range(0, t, ec):
            outs.append(predictor._encode_jit(predictor.params, resized4))
        jax.block_until_ready(outs)

    note("warm encode_pre_resized")
    encode_pre_resized()
    report("encode_pre_resized_chunk4", median_time(encode_pre_resized, reps))

    # b. ONE fused program: uint8 chunk -> resize -> encode
    for ec in (4, 8):
        if t % ec:
            continue

        @jax.jit
        def fused(p, chunk):
            x = resize_bilinear(
                chunk.astype(jnp.float32), (th, tw),
                antialias=predictor.antialias)
            return model.apply(p, x, method=Sam.encode_images)

        def run_fused(ec=ec, fused=fused):
            embs = []
            for i in range(0, t, ec):
                embs.append(fused(predictor.params, video_dev[i:i + ec]))
            jax.block_until_ready(embs)

        note(f"warm fused chunk {ec}")
        run_fused()
        report(f"fused_resize_encode_chunk{ec}", median_time(run_fused, reps))

    print(json.dumps({"probe": "summary",
                      **{k: v["ms_per_frame"] for k, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
