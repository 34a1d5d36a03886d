"""Convert BDD100K instance-segmentation bitmasks to VOS index annotations.

Equivalent of reference scripts/bdd100k_from_instance_seg_to_vos_annotations.py:
BDD100K MOTS bitmasks encode (category, truncated/occluded flags, ann_id) in
RGBA channels; VOS wants per-sequence index masks with stable per-object ids.
Usage: python scripts/bdd100k_from_instance_seg_to_vos_annotations.py \
    --bitmask_dir ... --out_dir ...
"""
import argparse
import os

import numpy as np
from PIL import Image


def convert_sequence(seq_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    id_map = {}
    for name in sorted(os.listdir(seq_dir)):
        if not name.endswith(".png"):
            continue
        bitmask = np.array(Image.open(os.path.join(seq_dir, name)))
        # ann_id is encoded in the (B, A) channels: id = B * 256 + A
        ann_ids = bitmask[..., 2].astype(np.int32) * 256 + bitmask[..., 3]
        out = np.zeros(ann_ids.shape, np.uint8)
        for ann_id in np.unique(ann_ids):
            if ann_id == 0:
                continue
            if ann_id not in id_map:
                if len(id_map) >= 255:
                    # 8-bit palette index masks hold ids 1..255; overflowing
                    # would crash (numpy>=2) or silently wrap ids into the
                    # background (numpy 1.x)
                    raise ValueError(
                        f"{seq_dir}: more than 255 distinct object ids in "
                        "one sequence — cannot be represented in an 8-bit "
                        "palette VOS index mask"
                    )
                id_map[ann_id] = len(id_map) + 1
            out[ann_ids == ann_id] = id_map[ann_id]
        Image.fromarray(out, mode="P").save(os.path.join(out_dir, name))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bitmask_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args()
    for seq in sorted(os.listdir(args.bitmask_dir)):
        convert_sequence(
            os.path.join(args.bitmask_dir, seq),
            os.path.join(args.out_dir, seq),
        )
        print(f"converted {seq}")


if __name__ == "__main__":
    main()
