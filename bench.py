"""Benchmark: video frames/sec/chip for the FULL SAM-PT pipeline.

Measures exactly the driver's north-star configuration (BASELINE.json):
DAVIS-shaped video through SamPt with the SAM ViT-H encoder + CoTracker
(stride 4, window 8), at the reference's DEFAULT point config (16 kmedoids
positives + 1 mixed negative per mask, configs/model/sam_pt.yaml), including
host-side query-point sampling, bidirectional tracking, batched SAM prompting
with the negative-point chain and 12 box-refinement passes, device-side
fusion to index masks, and the uint8 mask download — i.e., everything the
VOS eval harness times (reference methodology: total_frames /
total_process_time, sam_pt/vos_eval/eval.py:262-337).

Weights are random (no checkpoints ship with this environment); throughput is
weight-independent. Prints ONE JSON line.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 1.4  # reference SAM ViT-H (+PIPS tracker), 1 GPU (BASELINE.md)


def random_params(init_shape_fn, seed=1, dtype=jnp.bfloat16):
    shapes = jax.eval_shape(init_shape_fn)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(k, l.shape, dtype) * 0.02
         for k, l in zip(keys, leaves)],
    )


def build_pipeline(variant="vit_h"):
    from sam_pt_tpu.models.sam.predictor import SamPredictor
    from sam_pt_tpu.models.sam.sam_model import Sam
    from sam_pt_tpu.models.sam_pt import SamPt
    from sam_pt_tpu.models.tracker.cotracker.tracker import (
        CoTrackerPointTracker,
    )

    model = Sam(encoder_variant=variant, dtype=jnp.bfloat16)
    params = random_params(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 540, 1024, 3)),
            jnp.zeros((1, 2, 2)),
            jnp.zeros((1, 2), jnp.int32),
        )
    )
    predictor = SamPredictor(model, params)

    tracker = CoTrackerPointTracker(
        interp_shape=(384, 512), s=8, stride=4, iters=6,
        support_grid_size=2, support_grid_every_n_frames=12,
        dtype=jnp.bfloat16,
    )
    tracker.init_params(jax.random.PRNGKey(0), 64, 64)

    # The reference's default sampler/point config
    # (/root/reference/configs/model/sam_pt.yaml): 16 kmedoids positives +
    # 1 mixed negative per mask, other-object negatives on. The host-side
    # K-Medoids/Shi-Tomasi sampling cost is inside the reference's timed
    # region (vos_eval/eval.py:262-337), so it is inside ours too.
    return SamPt(
        point_tracker=tracker,
        sam_predictor=predictor,
        positive_points_per_mask=16,
        negative_points_per_mask=1,
        positive_point_selection_method="kmedoids",
        negative_point_selection_method="mixed",
        add_other_objects_positive_points_as_negative_points=True,
        iterative_refinement_iterations=12,
        sam_iou_threshold=0.7,
        sam_decode_chunk=48,
        sam_encode_chunk=4,
    )


def bench_full_pipeline(n_frames=16, n_masks=3, h=480, w=854):
    from sam_pt_tpu.vos_eval.eval import device_fuse_index_masks

    sam_pt = build_pipeline()

    rng = np.random.default_rng(0)
    masks = np.zeros((n_masks, h, w), np.float32)
    for i in range(n_masks):
        masks[i, 40 + 120 * i : 160 + 120 * i, 80 : 460] = 1
    video = {
        "image": rng.integers(0, 255, size=(n_frames, h, w, 3)).astype(np.uint8),
        "target_hw": (h, w),
        "query_masks": masks,
        "query_point_timestep": np.zeros((n_masks,), np.float32),
        "keep_logits_on_device": True,
    }

    def dispatch_once():
        out = sam_pt.forward(video)
        return device_fuse_index_masks(
            out["logits"], masks, [0] * n_masks, defer=True
        )  # fusion dispatched; uint8 download deferred

    dispatch_once().get()  # compile
    # The eval harness pipelines videos: video i's uint8 download resolves
    # while video i+1 computes (vos_eval/eval.py cross-video pipelining).
    # Measure the same schedule over a 3-video pipeline; median of 3 runs
    # (single-run times vary +-15% through the dev tunnel).
    n_videos = 3
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        pending = None
        for _ in range(n_videos):
            nxt = dispatch_once()
            if pending is not None:
                pending.get()
            pending = nxt
        pending.get()
        times.append(time.perf_counter() - t0)
    return n_videos * n_frames / sorted(times)[1]


def main():
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    try:
        fps = bench_full_pipeline()
        print(
            json.dumps(
                {
                    "metric": "sam_pt_e2e_fps_vith_cotracker_davis480p",
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
