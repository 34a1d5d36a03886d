"""Build a side-by-side GIF comparing two annotation/result directories.

Equivalent of reference scripts/annotation_comparison_gif.py.
Usage: python scripts/annotation_comparison_gif.py --frames ... --left ... --right ... --out cmp.gif
"""
import argparse
import os

import numpy as np
from PIL import Image

from sam_pt_tpu.utils.viz import MASK_COLORS, add_mask_to_frame, save_video


def overlay(frame, mask):
    out = frame
    for oid in np.unique(mask):
        if oid == 0:
            continue
        out = add_mask_to_frame(
            out, mask == oid, MASK_COLORS[(int(oid) - 1) % len(MASK_COLORS)])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", required=True)
    ap.add_argument("--left", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--out", default="comparison.gif")
    ap.add_argument("--fps", type=int, default=8)
    args = ap.parse_args()

    names = sorted(f for f in os.listdir(args.left) if f.endswith(".png"))
    rows = []
    for name in names:
        frame = np.array(
            Image.open(os.path.join(args.frames, name[:-4] + ".jpg")).convert("RGB"))
        left = np.array(Image.open(os.path.join(args.left, name)).convert("P"))
        right = np.array(Image.open(os.path.join(args.right, name)).convert("P"))
        rows.append(np.concatenate(
            [overlay(frame.copy(), left), overlay(frame.copy(), right)], axis=1))
    save_video(np.stack(rows), args.out, fps=args.fps)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
