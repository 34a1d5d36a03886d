"""Render DAVIS index masks as contour overlays on the video frames.

Equivalent of reference scripts/davis_mask_to_contour.py.
Usage: python scripts/davis_mask_to_contour.py --frames ... --masks ... --out ...
"""
import argparse
import os

import cv2
import numpy as np
from PIL import Image

COLORS = [(255, 64, 64), (64, 160, 255), (64, 255, 96), (255, 200, 32),
          (200, 64, 255), (64, 255, 230)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", required=True)
    ap.add_argument("--masks", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--thickness", type=int, default=2)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in sorted(os.listdir(args.masks)):
        if not name.endswith(".png"):
            continue
        mask = np.array(Image.open(os.path.join(args.masks, name)).convert("P"))
        frame_name = name[:-4] + ".jpg"
        frame = cv2.imread(os.path.join(args.frames, frame_name))
        if frame is None:
            continue
        for oid in np.unique(mask):
            if oid == 0:
                continue
            m = (mask == oid).astype(np.uint8)
            contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL,
                                           cv2.CHAIN_APPROX_SIMPLE)
            color = COLORS[(int(oid) - 1) % len(COLORS)][::-1]
            cv2.drawContours(frame, contours, -1, color, args.thickness)
        cv2.imwrite(os.path.join(args.out, frame_name), frame)
    print(f"Wrote contours to {args.out}")


if __name__ == "__main__":
    main()
