"""Interactive/video demo entry point.

Mirrors the reference demo surface (demo/demo.py: hydra main :35, frame
loading with stride/resize :191-222, query-points txt parsing :225-252 with
the format documented in data/demo_data/README.md, cv2 click UI :255-368) on
the TPU-native stack. Run:

    python -m demo.demo frames_path=... query_points_path=...

Outputs overlay mp4 + per-frame jpgs under cfg.output_dir instead of an
interactive cv2 playback window (headless-friendly).
"""
from __future__ import annotations

import os
import sys
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from sam_pt_tpu.config import compose, instantiate, resolve_interpolations
from sam_pt_tpu.utils.util import seed_all
from sam_pt_tpu.utils.viz import render_predictions, save_frames, save_video

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def load_frames(
    frames_path: str,
    frame_stride: int = 1,
    max_frames: Optional[int] = None,
    longest_side_length: Optional[int] = None,
) -> Tuple[np.ndarray, float]:
    """Load a frame directory or a video file.

    Returns ([T, H, W, 3] uint8 RGB, resize_scale) — the scale the frames
    were shrunk by (longest_side_length), which query points in
    original-frame coordinates must be multiplied by (reference
    demo.py:210-220 threads the same resize_factor into load_query_points).
    """
    if cv2 is None:
        raise ImportError(
            "opencv (cv2) is required to load demo frames/videos"
        )
    frames: List[np.ndarray] = []
    if os.path.isdir(frames_path):
        names = sorted(
            f for f in os.listdir(frames_path)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        for name in names[::frame_stride]:
            img = cv2.imread(os.path.join(frames_path, name))
            if img is None:
                raise IOError(
                    f"unreadable image: {os.path.join(frames_path, name)}"
                )
            frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
            if max_frames and len(frames) >= max_frames:
                break
    else:
        cap = cv2.VideoCapture(frames_path)
        idx = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % frame_stride == 0:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                if max_frames and len(frames) >= max_frames:
                    break
            idx += 1
        cap.release()
    if not frames:
        raise FileNotFoundError(f"No frames found at {frames_path}")
    video = np.stack(frames)
    scale = 1.0
    if longest_side_length:
        h, w = video.shape[1:3]
        scale = longest_side_length / max(h, w)
        if scale != 1.0:
            nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
            video = np.stack(
                [cv2.resize(f, (nw, nh), interpolation=cv2.INTER_AREA)
                 for f in video]
            )
    return video, scale


def load_query_points(
    path: str, scale: float = 1.0, frame_stride: int = 1
) -> Tuple[np.ndarray, int]:
    """Parse the reference query-points txt format.

    Line 1: number of positive points; following lines:
    `timestep ; x1,y1 x2,y2 ...` — positives first, negatives after
    (reference demo.py:225-252, data/demo_data/README.md). Coordinates are
    scaled by the frame resize factor and timesteps remapped to the strided
    frame indexing (reference :239-243 asserts t % stride == 0).
    Returns (query_points [M, P, 3] (t, x, y), n_positive).
    """
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    n_positive = int(lines[0])
    masks = []
    for line in lines[1:]:
        ts, _, rest = line.partition(";")
        t = int(ts)
        assert t % frame_stride == 0, (
            f"query timestep {t} is not a multiple of frame_stride "
            f"{frame_stride}"
        )
        t //= frame_stride
        pts = []
        for tok in rest.split():
            x, y = tok.split(",")
            pts.append((float(t), float(x) * scale, float(y) * scale))
        masks.append(pts)
    n_points = max(len(m) for m in masks)
    assert all(len(m) == n_points for m in masks), "ragged query point lists"
    return np.asarray(masks, np.float32), n_positive


def run_inference(model, images: np.ndarray, query_points: np.ndarray) -> dict:
    h, w = images.shape[1:3]
    video = {
        "video_name": "demo",
        "video_id": 0,
        "image": images,
        "target_hw": (h, w),
        "query_points": query_points,
    }
    return model.forward(video)


def main(cfg) -> dict:
    from sam_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    seed_all(cfg.get("seed", 72))
    images, resize_scale = load_frames(
        cfg["frames_path"],
        cfg.get("frame_stride", 1),
        cfg.get("max_frames"),
        cfg.get("longest_side_length"),
    )
    if cfg.get("query_points_path"):
        # query files use original-frame coordinates: auto-scale by the
        # frame resize factor (reference demo.py:210-220); an explicit
        # query_points_scale overrides the automatic factor
        scale = cfg.get("query_points_scale")
        query_points, n_positive = load_query_points(
            cfg["query_points_path"],
            resize_scale if scale is None else scale,
            cfg.get("frame_stride", 1),
        )
    else:  # fall back to the interactive cv2 click UI (needs a display)
        query_points, n_positive = interactive_query_points(images)

    model = instantiate(cfg["model"])
    model.positive_points_per_mask = n_positive
    model.negative_points_per_mask = query_points.shape[1] - n_positive

    import time

    t0 = time.perf_counter()
    outputs = run_inference(model, images, query_points)
    dt = time.perf_counter() - t0
    print(f"Inference: {len(images)} frames in {dt:.2f}s "
          f"({len(images) / dt:.2f} fps, incl. first-call compile)")

    out_dir = cfg.get("output_dir", "outputs/demo")
    frames = render_predictions(
        images,
        outputs["logits"],
        outputs["trajectories"],
        outputs["visibilities"],
    )
    save_video(frames, os.path.join(out_dir, "overlay.mp4"))
    save_frames(frames, os.path.join(out_dir, "frames"))
    print(f"Demo wrote {len(frames)} frames to {out_dir}")
    print(f"Scores: {outputs['scores']}")
    return outputs


def cli():
    overrides = [a for a in sys.argv[1:] if "=" in a]
    cfg = compose(CONFIG_DIR, "demo", overrides)
    cfg = resolve_interpolations(cfg)
    from sam_pt_tpu.utils.util import apply_platform_override

    apply_platform_override(cfg.get("platform"))
    return main(cfg)


def interactive_query_points(images: np.ndarray, n_positive: int = 1) -> np.ndarray:
    """cv2 click UI for collecting query points (reference demo.py:255-368).

    Left click = positive point, right click = negative point, 'n' = next
    mask, 'q' = done. Requires a display; headless runs should pass
    query_points_path instead.
    """
    if cv2 is None:
        raise RuntimeError("cv2 is required for the interactive UI")
    frame = cv2.cvtColor(images[0], cv2.COLOR_RGB2BGR).copy()
    masks: List[List[tuple]] = [[]]

    def on_mouse(event, x, y, flags, param):
        if event == cv2.EVENT_LBUTTONDOWN:
            masks[-1].append((0, float(x), float(y), 1))
            cv2.circle(frame, (x, y), 4, (0, 255, 0), -1)
        elif event == cv2.EVENT_RBUTTONDOWN:
            masks[-1].append((0, float(x), float(y), 0))
            cv2.circle(frame, (x, y), 4, (0, 0, 255), -1)

    cv2.namedWindow("query points")
    cv2.setMouseCallback("query points", on_mouse)
    while True:
        cv2.imshow("query points", frame)
        key = cv2.waitKey(30) & 0xFF
        if key == ord("n"):
            masks.append([])
        elif key == ord("q"):
            break
    cv2.destroyAllWindows()

    masks = [m for m in masks if m]
    if not masks:
        raise RuntimeError("no query points were clicked")
    pos_lists = [[p for p in m if p[3] == 1] for m in masks]
    neg_lists = [[p for p in m if p[3] == 0] for m in masks]
    if any(not p for p in pos_lists):
        raise RuntimeError(
            "every mask needs at least one positive (left-button) click"
        )
    # One fixed (n_positive, n_negative) shape across masks: keep the common
    # prefix of each kind. Padding with repeated positives would land them
    # in NEGATIVE label slots downstream (labels are assigned by position),
    # actively suppressing the mask they were meant to select.
    n_positive = min(len(p) for p in pos_lists)
    n_negative = min(len(n) for n in neg_lists)
    dropped = sum(
        len(m) - n_positive - n_negative for m in masks
    )
    if dropped:
        print(f"interactive: dropping {dropped} extra clicks so all masks "
              f"share ({n_positive} positive, {n_negative} negative) points")
    out = np.zeros((len(masks), n_positive + n_negative, 3), np.float32)
    for mi, (pos, neg) in enumerate(zip(pos_lists, neg_lists)):
        ordered = pos[:n_positive] + neg[:n_negative]
        out[mi] = [(t, x, y) for (t, x, y, _) in ordered]
    return out, n_positive


if __name__ == "__main__":
    cli()
