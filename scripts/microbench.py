"""Per-stage microbenchmark of the SAM-PT pipeline on the attached TPU.

Serializes the pipeline stages (block_until_ready between them) to
attribute wall-clock to: host query sampling, video upload, tracker, SAM
encode, decode chain + refinement, fusion + download. The end-to-end bench
(bench.py) stays the source of truth for the headline fps — overlapped
stages sum to less there. Run on an idle host: host-side stages (kmedoids,
upload) are meaningless under CPU contention.

Usage: python scripts/microbench.py [--frames 16] [--masks 3] [--reps 3]
Prints one JSON line per stage plus the serialized total.

`--roofline [--out ROOFLINE.json]` instead writes the machine-readable
platform/perf artifact the perf claims are audited against (VERDICT r2
item 6): measured sustained bf16 matmul TFLOP/s, effective HBM GB/s,
host->device upload MB/s, the serialized per-stage split for a 70-frame
3-mask 480p video, and the ViT-H encoder's achieved throughput vs its
analytic matmul-FLOP floor at the measured sustained rate.
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


def vit_matmul_flops_per_frame(variant="vit_h", image_size=1024):
    """Analytic matmul FLOPs for one frame through the SAM ViT encoder at
    the padded square input (the reference computes the full padded grid;
    exact-numerics implementations cannot skip pad tokens — see
    tests/test_pad_crop_deviation.py)."""
    from sam_pt_tpu.models.sam.image_encoder import VIT_VARIANTS

    cfg = VIT_VARIANTS[variant]
    d = cfg["embed_dim"]
    depth = cfg["depth"]
    window = cfg.get("window_size", 14)  # ImageEncoderViT default
    n_global = len(cfg["global_attn_indexes"])
    grid = image_size // 16
    tokens = grid * grid

    per_token_layer = 2 * (3 * d * d + d * d + 8 * d * d)  # qkv, proj, mlp
    matmuls = depth * tokens * per_token_layer

    padded = -(-grid // window) * window
    wtokens = padded * padded
    attn_w = (depth - n_global) * wtokens * 2 * 2 * (window * window) * d
    attn_g = n_global * tokens * 2 * 2 * tokens * d
    patch = tokens * 2 * (16 * 16 * 3 * d)
    neck = tokens * 2 * (d * 256 + 256 * 256 * 9)
    return float(matmuls + attn_w + attn_g + patch + neck)


def roofline(out_path, reps=3):
    """Measure the platform + pipeline roofline and write machine-readable
    JSON (ROOFLINE.json at the repo root each round)."""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    result = {
        "device": str(dev),
        "platform": jax.default_backend(),
        "production_v5e_reference": {
            "bf16_tflops_peak": 197.0,
            "hbm_gbps": 819.0,
            "note": "public v5e litepod chip specs, for context — the dev "
                    "chip behind the tunnel measures far below these",
        },
    }

    # --- host->device upload, BEFORE any large allocations
    up = np.random.default_rng(0).integers(
        0, 255, (70, 480, 854, 3)).astype(np.uint8)

    def upload():
        jax.device_put(up, dev).block_until_ready()

    upload()
    dt = median_time(upload, reps)
    result["upload_idle_mbps"] = round(up.nbytes / dt / 1e6, 1)

    # NB: on the remote-attached runtime `block_until_ready` does NOT wait
    # for device completion — sync by fetching one result element to host.
    # The fetch costs one round trip (~25 ms); measure it and subtract.
    tiny = jnp.zeros((), jnp.float32)
    np.asarray(tiny + 1)
    rtt = median_time(lambda: np.asarray(tiny + 1), max(reps, 5))
    result["sync_fetch_rtt_ms"] = round(1000 * rtt, 1)

    # --- sustained bf16 matmul TFLOP/s (chained in scan: no dispatch gaps)
    n, chain = 4096, 256
    a = jnp.full((n, n), 0.001, jnp.bfloat16)

    @jax.jit
    def mm_chain(a):
        def body(x, _):
            return x @ a, None

        y, _ = jax.lax.scan(body, a, None, length=chain)
        return y[0, 0]

    np.asarray(mm_chain(a))
    dt = median_time(lambda: np.asarray(mm_chain(a)), reps) - rtt
    result["matmul_bf16_tflops"] = round(chain * 2 * n ** 3 / dt / 1e12, 1)

    # --- effective HBM GB/s (chained elementwise add: read + write / step)
    x = jnp.ones((256, 1024, 1024), jnp.bfloat16)  # 512 MB
    ew_len = 64

    @jax.jit
    def ew_chain(x):
        def body(y, _):
            return y + jnp.bfloat16(1.0), None

        y, _ = jax.lax.scan(body, x, None, length=ew_len)
        return y[0, 0, 0]

    np.asarray(ew_chain(x))
    dt = median_time(lambda: np.asarray(ew_chain(x)), reps) - rtt
    result["hbm_effective_gbps"] = round(ew_len * 2 * x.nbytes / dt / 1e9, 1)
    del x

    # --- pipeline stage split (70-frame 3-mask 480p video, bench config)
    import bench

    sam_pt = bench.build_pipeline()
    stages = bench.stage_split(sam_pt, reps=reps)
    result["stages_70f_3m_s"] = stages

    # upload again with the pipeline resident (allocator under pressure —
    # measured far slower than the idle rate on this runtime)
    upload()
    dt = median_time(upload, reps)
    result["upload_loaded_mbps"] = round(up.nbytes / dt / 1e6, 1)

    # --- encoder achieved-vs-floor
    flops = vit_matmul_flops_per_frame("vit_h")
    enc_s_per_frame = stages["sam_encode"] / 70.0
    sustained = result["matmul_bf16_tflops"] * 1e12
    result["encoder_vit_h"] = {
        "matmul_flops_per_frame": flops,
        "measured_ms_per_frame": round(1000 * enc_s_per_frame, 2),
        "achieved_tflops": round(flops / enc_s_per_frame / 1e12, 1),
        "floor_ms_at_sustained_matmul": round(1000 * flops / sustained, 2),
        "pct_of_sustained_matmul": round(
            100 * (flops / sustained) / enc_s_per_frame, 1),
    }

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"wrote {out_path}")


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--masks", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 854))
    ap.add_argument("--roofline", action="store_true",
                    help="write the machine-readable platform/perf artifact")
    ap.add_argument("--out", default="ROOFLINE.json")
    args = ap.parse_args()

    if args.roofline:
        roofline(args.out, reps=args.reps)
        return

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
