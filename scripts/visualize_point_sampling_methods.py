"""Visualize the query-point sampling methods side by side on a mask.

Equivalent of reference scripts/visualize_point_sampling_methods.py.
Usage: python scripts/visualize_point_sampling_methods.py --image ... --mask ... --out out.png
"""
import argparse

import cv2
import numpy as np
from PIL import Image

from sam_pt_tpu.utils.query_points import (
    extract_corner_points,
    extract_kmedoid_points,
    extract_mixed_points,
    extract_random_mask_points,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--mask", required=True)
    ap.add_argument("--out", default="point_sampling_methods.png")
    ap.add_argument("--n_points", type=int, default=8)
    ap.add_argument("--seed", type=int, default=72)
    args = ap.parse_args()

    image = np.array(Image.open(args.image).convert("RGB"))
    mask = (np.array(Image.open(args.mask).convert("P")) > 0).astype(np.float32)
    rng = np.random.default_rng(args.seed)

    panels = []
    methods = {
        "random": lambda: extract_random_mask_points(mask, args.n_points, rng=rng),
        "kmedoids": lambda: extract_kmedoid_points(mask, args.n_points, rng=rng),
        "shi-tomasi": lambda: extract_corner_points(image, mask, args.n_points, rng=rng),
        "mixed": lambda: extract_mixed_points(
            [mask], np.zeros(1), image[None], args.n_points, rng=rng)[0],
    }
    for name, fn in methods.items():
        panel = image.copy()
        panel[mask > 0] = 0.6 * panel[mask > 0] + 0.4 * np.array([0, 160, 255])
        for x, y in fn():
            cv2.circle(panel, (int(x), int(y)), 4, (255, 0, 0), -1)
        cv2.putText(panel, name, (8, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.8,
                    (255, 255, 255), 2)
        panels.append(panel)
    grid = np.concatenate(
        [np.concatenate(panels[:2], axis=1), np.concatenate(panels[2:], axis=1)],
        axis=0,
    )
    Image.fromarray(grid.astype(np.uint8)).save(args.out)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
