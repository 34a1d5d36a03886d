"""A/B: unrolled vs window-batched fused window-attention kernel (ViT-H
shapes, chained with a link matmul whose cost is measured and subtracted).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from scripts.profile_encoder import measure_rtt, timed_chain
    from sam_pt_tpu.ops.flash_attention import fused_qkv_window_attention

    B, NW, N, H, DP, WIN = 4, 25, 196, 16, 80, 14
    L, reps = 28, 5
    bf = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    rtt = measure_rtt()
    print(json.dumps({"op": "rtt_ms", "ms": round(1000 * rtt, 2)}))

    qkv = jax.random.normal(rng, (B * NW, N, 3 * H * DP), bf) * 0.02
    rel = jax.random.normal(rng, (WIN, WIN, DP), bf) * 0.02
    wlink = jax.random.normal(rng, (H * DP, 3 * H * DP), bf) * 0.02

    ms_link = timed_chain(lambda y: (y[..., :H * DP] @ wlink), qkv, L, rtt,
                          reps)
    print(json.dumps({"op": "link", "ms": round(ms_link * 1000, 3)}))

    for name, flag in (("unrolled", False), ("batched", True)):
        def attn(y, flag=flag):
            o = fused_qkv_window_attention(
                y[..., : 3 * H * DP], rel, rel, scale=DP ** -0.5, heads=H,
                batched_kernel=flag,
            )
            return o @ wlink

        ms = timed_chain(attn, qkv, L, rtt, reps)
        print(json.dumps({
            "op": f"win_attn_{name}",
            "ms_per_chunk": round((ms - ms_link) * 1000, 3),
        }))

    # numerical agreement on-device
    a = fused_qkv_window_attention(qkv, rel, rel, scale=DP ** -0.5, heads=H,
                                   batched_kernel=False)
    b = fused_qkv_window_attention(qkv, rel, rel, scale=DP ** -0.5, heads=H,
                                   batched_kernel=True)
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(json.dumps({"op": "maxdiff", "value": d}))


if __name__ == "__main__":
    main()
