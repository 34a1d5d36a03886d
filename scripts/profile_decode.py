"""Per-op attribution of the SAM decode chain (VERDICT r4 work item #3).

BENCH r4 serialized stage split: sam_decode_chain = 1.26 s per 70f x 3m
video = 210 (frame, mask) pairs in 5 chunks of 48 through a 14-pass jitted
chain (pass 1 positives-only, pass 2 all-points + mask input, 12 box
refinements). This script times the chain and its components at the real
chunk shape so the cost is attributable:

  - full chain (present default, 12 refinements)
  - chain with 0 refinements (the 2 base passes + final upscale)
  - one bare decoder pass (prompt encode + two-way transformer + mask head)
  - one box-refine pass in isolation (upscale -> box -> decode)
  - upscale_logits alone (low-res -> 1024^2 -> crop -> 480x854)

Methodology: same as scripts/microbench.py post-recalibration — jitted
program, block_until_ready sync, measured RTT subtracted, median of reps.

Usage: python scripts/profile_decode.py [--reps 5] [--chunk 48]
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

SUSTAINED_TFLOPS = 194.3  # ROOFLINE.json
HBM_GBPS = 668.3


def median_time(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def measure_rtt(reps=7):
    tiny = jnp.zeros((), jnp.float32)
    np.asarray(tiny + 1)
    return median_time(lambda: np.asarray(tiny + 1), reps)


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=48)
    args = ap.parse_args()
    reps = args.reps
    chunk = args.chunk

    import bench

    rtt = measure_rtt()
    print(json.dumps({"op": "rtt_ms", "ms": round(1000 * rtt, 2)}))

    sam_pt = bench.build_pipeline()
    predictor = sam_pt.sam_predictor
    params = predictor.params
    hw = (480, 854)

    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (chunk, 64, 64, 256), jnp.bfloat16) * 0.02
    n_prompt = 17 + 2 * 16  # 16 pos + 1 neg + other-object negatives (2 objs)
    pts = jax.random.uniform(rng, (chunk, n_prompt, 2), jnp.float32) * 400
    lbl = jnp.ones((chunk, n_prompt), jnp.int32)
    low = jax.random.normal(rng, (chunk, 256, 256), jnp.float32)

    def report(name, s, note=""):
        rec = {"op": name, "ms_per_chunk48": round(1000 * s, 3),
               "s_per_70f3m_video": round(s * 210 / chunk, 4)}
        if note:
            rec["note"] = note
        print(json.dumps(rec))

    # full chain as the bench runs it
    chain = sam_pt._get_chain_fn(hw, upscale=True)
    out = chain(params, emb, pts, lbl)
    jax.block_until_ready(out)
    dt = median_time(
        lambda: jax.block_until_ready(chain(params, emb, pts, lbl)), reps
    ) - rtt
    report("chain_full_14pass", dt)

    # chain with zero refinements (2 base passes + upscale)
    saved = sam_pt.iterative_refinement_iterations
    sam_pt.iterative_refinement_iterations = 0
    sam_pt._chain_fns = {}
    chain0 = sam_pt._get_chain_fn(hw, upscale=True)
    out = chain0(params, emb, pts, lbl)
    jax.block_until_ready(out)
    dt0 = median_time(
        lambda: jax.block_until_ready(chain0(params, emb, pts, lbl)), reps
    ) - rtt
    report("chain_0refine_2pass", dt0,
           note=f"per-refine-pass = {(dt - dt0) / saved * 1000:.3f} ms")
    sam_pt.iterative_refinement_iterations = saved
    sam_pt._chain_fns = {}

    # one bare decoder pass
    pts_model = predictor.scale_coords(pts, hw)

    @jax.jit
    def one_decode(params, emb, pts_model, lbl):
        masks, iou = predictor._decode(params, emb, pts_model, lbl, None, None)
        return masks[:, 0], iou[:, 0]

    out = one_decode(params, emb, pts_model, lbl)
    jax.block_until_ready(out)
    dt1 = median_time(
        lambda: jax.block_until_ready(one_decode(params, emb, pts_model, lbl)),
        reps,
    ) - rtt
    report("decode_pass_bare", dt1)

    # one box-refine pass (upscale + box reduce + decode with mask input)
    iou0 = jnp.ones((chunk,), jnp.float32)

    @jax.jit
    def one_refine(params, emb, pts_model, lbl, low, iou):
        return sam_pt._box_refine_impl(params, emb, pts_model, lbl, low, iou,
                                       hw)

    out = one_refine(params, emb, pts_model, lbl, low, iou0)
    jax.block_until_ready(out)
    dtr = median_time(
        lambda: jax.block_until_ready(
            one_refine(params, emb, pts_model, lbl, low, iou0)), reps
    ) - rtt
    report("refine_pass_bare", dtr)

    # upscale_logits alone (the box source + final output op)
    @jax.jit
    def upscale(low):
        return predictor.upscale_logits(low, hw)

    out = upscale(low)
    jax.block_until_ready(out)
    dtu = median_time(lambda: jax.block_until_ready(upscale(low)), reps) - rtt
    # traffic: low f32 read + 1024^2 intermediate rw + crop + out rw
    traffic = chunk * 4 * (256 * 256 + 2 * 1024 * 256 + 2 * 1024 * 1024
                           + 2 * 576 * 854 + 480 * 854)
    report("upscale_logits", dtu,
           note=f"hbm floor ~{1000 * traffic / (HBM_GBPS * 1e9):.2f} ms")

    # prompt-embed + mask-input embed alone (the non-transformer part)
    @jax.jit
    def decode_with_mask(params, emb, pts_model, lbl, low):
        masks, iou = predictor._decode(
            params, emb, pts_model, lbl, low[:, :, :, None],
            jnp.ones(low.shape[0], bool))
        return masks[:, 0], iou[:, 0]

    out = decode_with_mask(params, emb, pts_model, lbl, low)
    jax.block_until_ready(out)
    dtm = median_time(
        lambda: jax.block_until_ready(
            decode_with_mask(params, emb, pts_model, lbl, low)), reps
    ) - rtt
    report("decode_pass_with_maskinput", dtm)

    print(json.dumps({
        "op": "summary",
        "note": "chain_full should ~= chain_0refine + 12 * refine_pass; "
                "refine = upscale+box (fused) + decode_with_maskinput",
    }))


if __name__ == "__main__":
    main()
