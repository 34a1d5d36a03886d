"""VIS dataset registry + loaders (YTVIS-format JSON).

Mirrors the reference's dataset registration surface
(sam_pt/vis_eval/mask2former_video/data_video/datasets/builtin.py: YTVIS
2019/2021, UVO v1/v0.5 splits incl. tiny debug splits) without detectron2:
a name -> (json, image_root, class_agnostic) registry and a loader that
yields per-video dicts ready for the adapter.
"""
from __future__ import annotations

import json
import os
from os import path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

# name -> (annotations json, image root, class_agnostic)
_PREDEFINED = {
    "ytvis_2019_val": ("ytvis_2019/valid.json", "ytvis_2019/valid/JPEGImages", False),
    "ytvis_2019_train": ("ytvis_2019/train.json", "ytvis_2019/train/JPEGImages", False),
    "ytvis_2021_val": ("ytvis_2021/valid/instances.json", "ytvis_2021/valid/JPEGImages", False),
    "ytvis_2021_val_tiny": ("ytvis_2021/valid/instances_tiny.json", "ytvis_2021/valid/JPEGImages", False),
    "ytvis_2021_val_mini": ("ytvis_2021/valid/instances_mini.json", "ytvis_2021/valid/JPEGImages", False),
    "uvo_v1_val": ("UVOv1.0/VideoDenseSet/UVO_video_val_dense.json", "UVOv1.0/uvo_videos_dense_frames", True),
    "uvo_v1_val_tiny": ("UVOv1.0/VideoDenseSet/UVO_video_val_dense_tiny.json", "UVOv1.0/uvo_videos_dense_frames", True),
    "uvo_v05_val": ("UVOv0.5/VideoDenseSet/UVO_video_val_dense.json", "UVOv0.5/uvo_videos_dense_frames", True),
}

_CUSTOM: Dict[str, Tuple[str, str, bool]] = {}


def register_dataset(name: str, json_file: str, image_root: str,
                     class_agnostic: bool = False) -> None:
    _CUSTOM[name] = (json_file, image_root, class_agnostic)


def resolve_dataset(name: str, data_root: str) -> Tuple[str, str, bool]:
    if name in _CUSTOM:
        # same data_root semantics as the predefined table: relative paths
        # resolve under data_root, absolute paths pass through
        j, r, ca = _CUSTOM[name]
        return (
            j if path.isabs(j) else path.join(data_root, j),
            r if path.isabs(r) else path.join(data_root, r),
            ca,
        )
    if name not in _PREDEFINED:
        raise KeyError(f"Unknown VIS dataset: {name}")
    j, r, ca = _PREDEFINED[name]
    return path.join(data_root, j), path.join(data_root, r), ca


class VISDataset:
    """YTVIS-format dataset: iterates videos as adapter-ready dicts."""

    def __init__(self, json_file: str, image_root: str,
                 class_agnostic: bool = False):
        with open(json_file) as f:
            self.gt = json.load(f)
        self.image_root = image_root
        self.class_agnostic = class_agnostic
        self.videos = self.gt["videos"]

    def __len__(self) -> int:
        return len(self.videos)

    def load_video(self, video: Dict) -> Dict:
        frames = []
        for name in video["file_names"]:
            img = Image.open(path.join(self.image_root, name)).convert("RGB")
            frames.append(np.asarray(img))
        images = np.stack(frames)
        return {
            "video_id": video["id"],
            "image": images,
            "height": video["height"],
            "width": video["width"],
            "file_names": video["file_names"],
            "length": video.get("length", len(frames)),
        }

    def __iter__(self) -> Iterator[Dict]:
        for v in self.videos:
            yield self.load_video(v)
