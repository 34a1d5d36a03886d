"""Extract frames from UVO videos into per-video JPEG directories.

Equivalent of reference scripts/uvo_video2frames.py (cv2-based; the baked
image has no ffmpeg binary).
Usage: python scripts/uvo_video2frames.py --video_dir ... --frames_dir ...
"""
import argparse
import os

import cv2


def video_to_frames(video_path: str, out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        cv2.imwrite(os.path.join(out_dir, f"{idx:05d}.jpg"), frame)
        idx += 1
    cap.release()
    return idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video_dir", required=True)
    ap.add_argument("--frames_dir", required=True)
    args = ap.parse_args()
    for name in sorted(os.listdir(args.video_dir)):
        if not name.lower().endswith((".mp4", ".mov", ".avi")):
            continue
        stem = os.path.splitext(name)[0]
        n = video_to_frames(
            os.path.join(args.video_dir, name),
            os.path.join(args.frames_dir, stem),
        )
        print(f"{name}: {n} frames")


if __name__ == "__main__":
    main()
