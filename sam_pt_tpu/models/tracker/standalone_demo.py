"""Shared standalone point-tracker demo (TAPIR / TapNet smoke tests).

The reference ships per-tracker demo scripts that verify the framework
setup end to end: load the bundled demo clip, run the tracker alone, time
the jitted forward, and plot the trajectories
(/root/reference/sam_pt/point_tracker/tapir/demo.py:1-147,
 /root/reference/sam_pt/point_tracker/tapnet/demo.py:1-121). This module is
their TPU-native equivalent; `sam_pt_tpu.models.tracker.{tapir,tapnet}.demo`
are thin entry points over `run()`.

Usage:
    python -m sam_pt_tpu.models.tracker.tapir.demo [--checkpoint PATH]
    python -m sam_pt_tpu.models.tracker.tapnet.demo [--checkpoint PATH]

Without a checkpoint the tracker runs with random weights — the demo then
only smoke-tests the compiled forward path and timing, like the reference
demo does before checkpoints are downloaded.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _build_tracker(name: str, checkpoint: str | None):
    if name == "tapir":
        from .tapir.tracker import TapirPointTracker

        return TapirPointTracker(
            checkpoint_path=checkpoint, allow_random_init=checkpoint is None
        )
    if name == "tapnet":
        from .tapnet.tracker import TapNetPointTracker

        return TapNetPointTracker(
            checkpoint_path=checkpoint, allow_random_init=checkpoint is None
        )
    raise ValueError(f"unknown tracker: {name}")


def run(name: str, argv=None) -> dict:
    ap = argparse.ArgumentParser(description=f"{name} standalone demo")
    ap.add_argument("--checkpoint", default=None,
                    help="tracker checkpoint (reference docs/03); random "
                         "weights if omitted")
    ap.add_argument("--frames", default="data/demo_data/bees.mp4")
    ap.add_argument("--query-points",
                    default="data/demo_data/query_points__bees.txt")
    ap.add_argument("--frame-stride", type=int, default=4)
    ap.add_argument("--max-frames", type=int, default=16)
    ap.add_argument("--longest-side", type=int, default=512)
    ap.add_argument("--out", default=f"outputs/demo_{name}_tracker")
    args = ap.parse_args(argv)

    from demo.demo import load_frames, load_query_points

    frames, scale = load_frames(
        args.frames, frame_stride=args.frame_stride,
        max_frames=args.max_frames, longest_side_length=args.longest_side,
    )
    query_points, _ = load_query_points(
        args.query_points, scale=scale, frame_stride=args.frame_stride)
    qp = query_points.reshape(1, -1, 3)  # all masks' points, one call
    t = frames.shape[0]
    print(f"{name}: {t} frames {frames.shape[1]}x{frames.shape[2]}, "
          f"{qp.shape[1]} query points, checkpoint={args.checkpoint}")

    tracker = _build_tracker(name, args.checkpoint)

    video = frames[None]
    t0 = time.perf_counter()
    traj, vis = tracker.forward(video, qp)
    print(f"first forward (incl. compile): {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    traj, vis = tracker.forward(video, qp)
    dt = time.perf_counter() - t0
    print(f"steady-state forward: {dt:.2f}s = {t / dt:.2f} frames/s")

    traj = np.asarray(traj)[0]  # [T, N, 2]
    vis = np.asarray(vis)[0]    # [T, N]

    os.makedirs(args.out, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        ax.imshow(frames[0])
        cmap = plt.get_cmap("hsv")
        n = traj.shape[1]
        for i in range(n):
            ax.plot(traj[:, i, 0], traj[:, i, 1], "-", lw=1,
                    color=cmap(i / max(n, 1)))
            visible = vis[:, i] > 0
            ax.scatter(traj[visible, i, 0], traj[visible, i, 1], s=6,
                       color=cmap(i / max(n, 1)))
        ax.set_title(f"{name} trajectories (first frame)")
        ax.set_axis_off()
        path = os.path.join(args.out, "trajectories.png")
        fig.savefig(path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        print(f"saved {path}")
    except Exception as e:  # matplotlib optional, like the reference demos
        print(f"plot skipped: {e}")

    return {"trajectories": traj, "visibilities": vis, "fps": t / dt}
