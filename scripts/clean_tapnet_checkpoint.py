"""Strip optimizer state from a TapNet/TAPIR haiku checkpoint.

Equivalent of reference scripts/clean_tapnet_checkpoint.py: the public
checkpoints bundle optimizer state; evaluation only needs params (+ state).
Usage: python scripts/clean_tapnet_checkpoint.py in.npy out.npy
"""
import sys

import numpy as np


def main(src: str, dst: str) -> None:
    ckpt = np.load(src, allow_pickle=True).item()
    cleaned = {"params": ckpt["params"]}
    if "state" in ckpt:
        cleaned["state"] = ckpt["state"]
    np.save(dst, cleaned)
    print(f"Wrote cleaned checkpoint to {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
