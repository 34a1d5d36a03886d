"""Measure per-program launch overhead on the encode path.

Today a 72-frame video runs 18 separate 4-frame fused resize+encode
programs. If each program launch costs device idle through the
remote-attached executor, folding chunks into one lax.scan program (body =
the same 4-frame encode, compiled ONCE) recovers launches x idle.

Usage: python scripts/probe_encode_scan.py [--reps 5]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--group", type=int, default=4,
                    help="chunks per scan program in the grouped variant")
    args = ap.parse_args()

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
    ec = 4
    video = np.random.default_rng(0).integers(0, 255, (t, h, w, 3)).astype(
        np.uint8)
    video_dev = jnp.asarray(video)
    video_dev.block_until_ready()
    th, tw = get_longest_side_target_hw(h, w, model.image_size)

    def encode_chunk_logic(p, chunk):
        x = resize_bilinear(
            chunk.astype(jnp.float32), (th, tw),
            antialias=predictor.antialias)
        return model.apply(p, x, method=Sam.encode_images)

    # A: one program per 4-frame chunk (today's structure)
    def per_chunk():
        embs = [predictor.encode_frames(video_dev[i:i + ec], (h, w))
                for i in range(0, t, ec)]
        jax.block_until_ready(embs)

    note("warm per_chunk")
    per_chunk()
    dt = median_time(per_chunk, args.reps)
    print(json.dumps({"probe": f"per_chunk4_x{t // ec}", "s": round(dt, 4),
                      "ms_per_frame": round(1000 * dt / t, 2)}), flush=True)

    # B: grouped scan — `group` chunks per program
    g = args.group
    per_prog = g * ec

    @jax.jit
    def scan_encode(p, block):  # [g*ec, H, W, 3]
        chunks = block.reshape(g, ec, h, w, 3)

        def body(carry, chunk):
            return carry, encode_chunk_logic(p, chunk)

        _, embs = jax.lax.scan(body, None, chunks)
        return embs

    assert t % per_prog == 0, (t, per_prog)

    def grouped():
        embs = [scan_encode(predictor.params, video_dev[i:i + per_prog])
                for i in range(0, t, per_prog)]
        jax.block_until_ready(embs)

    note("warm grouped (scan compile)")
    grouped()
    dt = median_time(grouped, args.reps)
    print(json.dumps({"probe": f"scan_group{g}_x{t // per_prog}",
                      "s": round(dt, 4),
                      "ms_per_frame": round(1000 * dt / t, 2)}), flush=True)


if __name__ == "__main__":
    main()
