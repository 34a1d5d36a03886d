"""A/B the window-attention kernel's VMEM group size at ViT-H bench shapes.

The heuristic picks group=4 under a conservative 9.5 MB VMEM budget;
group=5 (bw=100 divides) would run 20% fewer grid steps at ~11 MB. This
measures both (and the XLA fallback) with the chained-scan methodology.

Usage: python scripts/ab_win_group.py [--reps 5]
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

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--length", type=int, default=28)
    args = ap.parse_args()

    from profile_encoder import measure_rtt, timed_chain
    from sam_pt_tpu.ops.flash_attention import fused_qkv_window_attention

    rtt = measure_rtt()
    print(json.dumps({"op": "rtt_ms", "ms": round(1000 * rtt, 2)}))

    B, NW, WIN, H, DP = 4, 25, 14, 16, 80
    N = WIN * WIN
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    qkv = jax.random.normal(rng, (B * NW, N, 3 * H * DP), bf) * 0.02
    rel = jax.random.normal(rng, (WIN, WIN, DP), bf) * 0.02
    wlink = jax.random.normal(rng, (H * DP, 3 * H * DP), bf) * 0.02

    ms_link = timed_chain(lambda y: (y[..., :H * DP] @ wlink), qkv,
                          args.length, rtt, args.reps)
    print(json.dumps({"op": "link", "ms": round(1000 * ms_link, 3)}))

    for group in (2, 4, 5):
        def attn(y, group=group):
            o = fused_qkv_window_attention(
                y[..., : 3 * H * DP], rel, rel, scale=DP ** -0.5, heads=H,
                group=group,
            )
            return o @ wlink

        try:
            ms = timed_chain(attn, qkv, args.length, rtt, args.reps)
        except Exception as e:  # VMEM overflow etc.
            print(json.dumps({"op": f"group{group}", "error": str(e)[:150]}))
            continue
        print(json.dumps({"op": f"group{group}",
                          "kernel_ms": round(1000 * (ms - ms_link), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
