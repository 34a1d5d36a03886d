"""Index-mask <-> one-hot conversion with non-contiguous label remapping.

Pure-numpy re-implementation of the XMem-style MaskMapper the reference uses
(sam_pt/vos_eval/data/mask_mapper.py:19-77): new labels encountered across
frames are remapped to consecutive channel indices; `remap_index_mask`
restores original label values for saving.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def all_to_onehot(masks: np.ndarray, labels: List[int]) -> np.ndarray:
    """Index mask [H, W] (or [T, H, W]) -> one-hot [L, ...] uint8."""
    out = np.zeros((len(labels), *masks.shape), dtype=np.uint8)
    for i, l in enumerate(labels):
        out[i] = (masks == l).astype(np.uint8)
    return out


class MaskMapper:
    def __init__(self):
        self.labels: List[int] = []
        self.remappings = {}
        self.coherent = True  # identity mapping so far

    def convert_mask(
        self,
        mask: np.ndarray,
        exhaustive: bool = False,
        dtype=np.uint8,
        old_labels_allowed: bool = False,
    ) -> Tuple[np.ndarray, List[int]]:
        labels = np.unique(mask).astype(dtype)
        labels = labels[labels != 0].tolist()

        new_labels = [l for l in labels if l not in self.labels]
        if not exhaustive and not old_labels_allowed:
            assert len(new_labels) == len(labels), (
                "Old labels found in non-exhaustive mode"
            )

        for i, l in enumerate(new_labels):
            idx = i + len(self.labels) + 1
            self.remappings[l] = idx
            if self.coherent and idx != l:
                self.coherent = False

        if exhaustive:
            new_mapped = list(range(1, len(self.labels) + len(new_labels) + 1))
        elif self.coherent:
            new_mapped = new_labels
        else:
            new_mapped = list(
                range(len(self.labels) + 1, len(self.labels) + len(new_labels) + 1)
            )

        self.labels.extend(new_labels)
        onehot = all_to_onehot(mask, self.labels).astype(np.float32)
        return onehot, new_mapped

    def remap_index_mask(self, mask: np.ndarray) -> np.ndarray:
        if self.coherent:
            return mask
        out = np.zeros_like(mask)
        for l, i in self.remappings.items():
            out[mask == i] = l
        return out
