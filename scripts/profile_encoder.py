"""Per-op attribution of ViT-H encode time (round-4 perf work).

VERDICT r3 #1: encoder measures 52.6% of sustained matmul (55.3 ms/frame vs
29.1 ms analytic floor at 194 TFLOP/s). This script times each sublayer op
of the window/global blocks individually, chained in lax.scan (no dispatch
gaps), syncing via a scalar fetch and subtracting the measured RTT — the
recalibrated methodology of scripts/microbench.py (commit 410653e).

Usage: python scripts/profile_encoder.py [--chunk 4] [--reps 5]
Prints one JSON line per op with ms per 4-frame chunk and the analytic
matmul-floor ms at the committed sustained rate, so overhead = measured -
floor is attributable per op.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SUSTAINED_TFLOPS = 194.3  # ROOFLINE.json r3
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


def timed_chain(fn, x, length, rtt, reps):
    """Time `length` chained applications of fn via lax.scan; returns seconds
    per application (RTT-corrected)."""

    @jax.jit
    def chain(x):
        def body(y, _):
            return fn(y), None

        y, _ = jax.lax.scan(body, x, None, length=length)
        return jnp.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0]

    np.asarray(chain(x))  # compile + warm
    dt = median_time(lambda: np.asarray(chain(x)), reps) - rtt
    return dt / length


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--length", type=int, default=28)
    args = ap.parse_args()

    from sam_pt_tpu.ops.fast_ln import FastLayerNorm, fast_gelu
    from sam_pt_tpu.ops.flash_attention import (
        fused_qkv_relpos_attention,
        fused_qkv_window_attention,
    )

    rtt = measure_rtt()
    print(json.dumps({"op": "rtt_ms", "ms": round(1000 * rtt, 2)}))

    B = args.chunk
    D = 1280
    H = 16
    DP = 80  # native head dim (window blocks)
    DPG = 128  # padded head dim (global blocks)
    WIN = 14
    NW = 25  # windows per frame (70x70 padded grid / 14)
    NTOK_W = WIN * WIN  # 196
    GRID = 64
    NTOK_G = GRID * GRID

    L = args.length
    reps = args.reps
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    results = {}

    def report(name, ms, floor_ms=None, note=""):
        rec = {"op": name, "ms_per_chunk": round(ms * 1000, 3)}
        if floor_ms is not None:
            rec["floor_ms"] = round(floor_ms, 3)
            rec["pct_of_floor"] = round(100 * floor_ms / (ms * 1000), 1) if ms > 0 else None
        if note:
            rec["note"] = note
        results[name] = rec
        print(json.dumps(rec))

    # ---------------- window-layer ops at real shapes -----------------
    xw = jax.random.normal(rng, (B * NW, NTOK_W, D), bf) * 0.02

    # LN (FastLayerNorm)
    ln = FastLayerNorm(epsilon=1e-6, dtype=bf)
    ln_p = ln.init(rng, xw)
    ms = timed_chain(lambda y: ln.apply(ln_p, y), xw, L, rtt, reps)
    traffic = 2 * xw.size * 2  # read+write bf16
    report("win_ln", ms, floor_ms=1000 * traffic / (HBM_GBPS * 1e9),
           note="bandwidth floor")

    # qkv Dense 1280 -> 3840
    wq = jax.random.normal(rng, (D, 3 * H * DP), bf) * 0.02
    sq = jax.random.normal(rng, (3 * H * DP, D), bf) * 0.002

    def qkv_roundtrip(y):
        return (y @ wq) @ sq  # project out and back so the chain type-checks

    ms = timed_chain(qkv_roundtrip, xw, L, rtt, reps)
    fl = 2 * B * NW * NTOK_W * D * 3 * H * DP * 2  # fwd+back
    report("win_qkv_roundtrip", ms, floor_ms=1000 * fl / (SUSTAINED_TFLOPS * 1e12),
           note="two matmuls (out+back)")

    # window attention kernel alone (qkv input precomputed once). The chain
    # link back to qkv width is ONE 1280->3840 matmul whose cost is measured
    # separately (win_link below) and subtracted — a concat link would cost
    # ~1.2 ms of pure HBM copy and swamp the kernel (first-run lesson).
    qkv_w = jax.random.normal(rng, (B * NW, NTOK_W, 3 * H * DP), bf) * 0.02
    rel = jax.random.normal(rng, (WIN, WIN, DP), bf) * 0.02
    wlink = jax.random.normal(rng, (H * DP, 3 * H * DP), bf) * 0.02

    ms_link = timed_chain(lambda y: (y[..., :H * DP] @ wlink), qkv_w, L, rtt,
                          reps)
    fl_link = 2 * B * NW * NTOK_W * H * DP * 3 * H * DP
    report("win_link(slice+matmul)", ms_link,
           floor_ms=1000 * fl_link / (SUSTAINED_TFLOPS * 1e12))

    def win_attn(y):
        o = fused_qkv_window_attention(
            y[..., : 3 * H * DP], rel, rel, scale=DP ** -0.5, heads=H
        )
        return o @ wlink

    ms = timed_chain(win_attn, qkv_w, L, rtt, reps)
    # analytic: logits (dp+bp contraction) + pv + bias einsums
    bp = 32
    fl = B * NW * H * (2 * NTOK_W * NTOK_W * (DP + bp) + 2 * NTOK_W * NTOK_W * DP) \
        + 2 * 2 * B * NW * NTOK_W * H * DP * WIN
    report("win_attn_kernel", ms - ms_link,
           floor_ms=1000 * fl / (SUSTAINED_TFLOPS * 1e12),
           note="link matmul cost subtracted")

    # proj Dense 1280 -> 1280
    wp = jax.random.normal(rng, (D, D), bf) * 0.02
    ms = timed_chain(lambda y: y @ wp, xw, L, rtt, reps)
    fl = 2 * B * NW * NTOK_W * D * D
    report("win_proj", ms, floor_ms=1000 * fl / (SUSTAINED_TFLOPS * 1e12))

    # MLP: lin1 -> gelu -> lin2
    w1 = jax.random.normal(rng, (D, 4 * D), bf) * 0.02
    w2 = jax.random.normal(rng, (4 * D, D), bf) * 0.002

    def mlp(y):
        return fast_gelu(y @ w1, bf) @ w2

    ms = timed_chain(mlp, xw, L, rtt, reps)
    fl = 2 * B * NW * NTOK_W * D * 4 * D * 2
    report("win_mlp", ms, floor_ms=1000 * fl / (SUSTAINED_TFLOPS * 1e12))

    # full window block composition (LN->qkv->attn->proj->res->LN->MLP->res)
    from sam_pt_tpu.models.sam.image_encoder import Block

    blk = Block(num_heads=H, window_size=WIN, input_size=(GRID, GRID),
                pre_windowed=True, padded_head_dim=None, fused_window=True,
                dtype=bf)
    blk_p = blk.init(rng, xw)
    ms = timed_chain(lambda y: blk.apply(blk_p, y), xw, L, rtt, reps)
    fl = B * NW * NTOK_W * 24 * D * D + B * NW * H * 4 * NTOK_W * NTOK_W * DP
    report("win_block_full", ms, floor_ms=1000 * fl / (SUSTAINED_TFLOPS * 1e12))

    # ---------------- global-layer ops -----------------
    xg = jax.random.normal(rng, (B, GRID, GRID, D), bf) * 0.02

    blkg = Block(num_heads=H, window_size=0, input_size=(GRID, GRID),
                 padded_head_dim=DPG, dtype=bf)
    blkg_p = blkg.init(rng, xg)
    ms = timed_chain(lambda y: blkg.apply(blkg_p, y), xg, min(L, 8), rtt, reps)
    fl = B * NTOK_G * 24 * D * D + B * H * 4 * NTOK_G * NTOK_G * DP
    report("glob_block_full", ms, floor_ms=1000 * fl / (SUSTAINED_TFLOPS * 1e12))

    # global attention kernel alone (matmul chain link, cost subtracted)
    qkv_g = jax.random.normal(rng, (B, NTOK_G, 3 * H * DPG), bf) * 0.02
    relg = jax.random.normal(rng, (GRID, GRID, DPG), bf) * 0.02
    wlinkg = jax.random.normal(rng, (H * DPG, 3 * H * DPG), bf) * 0.02

    ms_linkg = timed_chain(lambda y: (y[..., :H * DPG] @ wlinkg), qkv_g,
                           min(L, 8), rtt, reps)
    fl_linkg = 2 * B * NTOK_G * H * DPG * 3 * H * DPG
    report("glob_link(slice+matmul)", ms_linkg,
           floor_ms=1000 * fl_linkg / (SUSTAINED_TFLOPS * 1e12))

    def glob_attn(y):
        o = fused_qkv_relpos_attention(
            y[..., : 3 * H * DPG], relg, relg, scale=DP ** -0.5,
            kh=GRID, kw=GRID, heads=H,
        )
        return o @ wlinkg

    ms = timed_chain(glob_attn, qkv_g, min(L, 8), rtt, reps)
    fl = B * H * (2 * NTOK_G * NTOK_G * (DPG + 128) + 2 * NTOK_G * NTOK_G * DPG) \
        + 2 * 2 * B * NTOK_G * H * DPG * GRID
    report("glob_attn_kernel", ms - ms_linkg,
           floor_ms=1000 * fl / (SUSTAINED_TFLOPS * 1e12),
           note="link matmul cost subtracted")

    # ---------------- whole encoder -----------------
    from sam_pt_tpu.models.sam.image_encoder import build_image_encoder

    enc = build_image_encoder("vit_h", dtype=bf)
    from bench import random_params

    enc_p = random_params(
        lambda: enc.init(jax.random.PRNGKey(0), jnp.zeros((B, 1024, 1024, 3)))
    )
    xin = jax.random.normal(rng, (B, 1024, 1024, 3), bf) * 0.5

    # Plain jit(apply) + block_until_ready: the scalar-projected wrapper
    # (`.ravel()[0]` inside the jit) reproducibly broke the tunnel's remote
    # compile service on the full 32-layer program; block_until_ready costs
    # the same RTT the scalar fetch did, which the subtraction removes.
    run_enc = jax.jit(lambda x: enc.apply(enc_p, x))

    run_enc(xin).block_until_ready()
    dt = median_time(lambda: run_enc(xin).block_until_ready(), reps) - rtt
    from scripts.microbench import vit_matmul_flops_per_frame

    fl = vit_matmul_flops_per_frame("vit_h") * B
    report("encoder_full", dt, floor_ms=1000 * fl / (SUSTAINED_TFLOPS * 1e12))
    print(json.dumps({
        "op": "encoder_full_per_frame",
        "ms": round(1000 * dt / B, 2),
        "floor_ms": round(1000 * fl / B / (SUSTAINED_TFLOPS * 1e12), 2),
    }))

    # reconciliation: 28 * win_block + 4 * glob_block + patch/neck remainder
    est = (28 * results["win_block_full"]["ms_per_chunk"]
           + 4 * results["glob_block_full"]["ms_per_chunk"])
    print(json.dumps({
        "op": "sum_of_blocks",
        "ms_per_chunk": round(est, 2),
        "encoder_minus_blocks_ms": round(1000 * dt - est, 2),
        "note": "remainder = patch embed + pos add + partition/unpartition + neck",
    }))


if __name__ == "__main__":
    main()
